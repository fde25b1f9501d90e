from docling_ray.functions.normalize import (
    clean_unicode,
    expand_ligatures,
    merge_hyphenated_lines,
    sanitize_cell_text,
    collapse_whitespace,
)
from docling_ray.functions.hashing import (
    stable_hash64,
    content_md5,
    normalized_fingerprint,
    word_shingles,
)

__all__ = [
    "clean_unicode",
    "expand_ligatures",
    "merge_hyphenated_lines",
    "sanitize_cell_text",
    "collapse_whitespace",
    "stable_hash64",
    "content_md5",
    "normalized_fingerprint",
    "word_shingles",
]

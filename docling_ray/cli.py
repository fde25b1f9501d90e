"""User-facing convert CLI (the reference's ``docling`` command,
``docling/cli/main.py:706``): convert files or directories with format
fan-out and write the chosen export format per document.

    python -m docling_ray.cli convert SRC [SRC...] \\
        --to markdown --output out/ --num-cpus 4

Each input file becomes one document: text-like files ride as raw text
spans, binary containers (PDF, images, zip archives, gzip) as base64 —
the content sniffer then routes every payload to its extractor, so an
unlabeled mixed directory converts end to end. Results are written one
file per document (``<stem>.<ext>``) plus a ``_conversions.jsonl``
status manifest (per-document status/errors — the CLI analogue of the
ConversionResult stream, errors as data).

This entry point OWNS a Ray session (like bench.py and jobs/) — it is a
process main, never imported by library code.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys

_TEXT_EXTS = {
    ".html", ".htm", ".md", ".txt", ".csv", ".tsv", ".xml", ".json",
    ".vtt", ".eml", ".adoc", ".asciidoc", ".tex", ".boxnote", ".dclg",
    ".fods", ".xhtml",
}
_EXT_FMT = {
    "markdown": ".md", "text": ".txt", "doctags": ".doctags.xml",
    "html": ".html", "html_split_page": ".paged.html", "vtt": ".vtt",
    "chunks": ".chunks.json", "json": ".json", "doclang": ".dclg",
    "dclx": ".dclx", "yaml": ".yaml",
}


def _iter_files(sources: list[str]):
    """Yield (path, output stem). Stems come from the path RELATIVE to the
    source root with separators encoded, so a/x.html and b/x.md in one
    tree cannot overwrite each other's converted output."""
    for src in sources:
        if os.path.isdir(src):
            for root, _dirs, files in os.walk(src):
                for f in sorted(files):
                    path = os.path.join(root, f)
                    rel = os.path.relpath(path, src)
                    stem = os.path.splitext(rel)[0].replace(os.sep, "__")
                    yield path, stem
        else:
            yield src, os.path.splitext(os.path.basename(src))[0]


def _payload_for(path: str) -> str:
    """Raw text for text-like files, base64 for binary containers — the
    sniffer understands both encodings."""
    ext = os.path.splitext(path)[1].lower()
    data = open(path, "rb").read()
    if ext in _TEXT_EXTS:
        return data.decode("utf-8", errors="replace")
    try:
        text = data.decode("utf-8")
        if text.isprintable() or all(
                c.isprintable() or c in "\r\n\t" for c in text[:4096]):
            return text
    except UnicodeDecodeError:
        pass
    return base64.b64encode(data).decode("ascii")


def cmd_convert(args: argparse.Namespace) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import pyarrow as pa

    from docling_ray import schema as S
    from docling_ray.pipelines.extract import extract_corpus
    from docling_ray.stages.export import export_batch

    files = list(_iter_files(args.sources))
    if not files:
        print("no input files", file=sys.stderr)
        return 2
    stem_of: dict[str, str] = {}
    seen_stems: set[str] = set()
    rows = []
    for path, stem in files:
        try:
            payload = _payload_for(path)
        except OSError as e:
            print(f"skip {path}: {e}", file=sys.stderr)
            continue
        if stem in seen_stems:  # two sources collapsing to one output
            print(f"error: duplicate output name {stem!r} (from {path})",
                  file=sys.stderr)
            return 2
        seen_stems.add(stem)
        stem_of[path] = stem
        rows.append({
            "doc_id": path,
            "spans": [{"kind": args.kind, "text": payload,
                       "media_ref": "", "offset": 0}],
        })
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows,
                                                  schema=S.INPUT_SCHEMA))
    out = extract_corpus(ds, mode="fast")

    os.makedirs(args.output, exist_ok=True)
    ext = _EXT_FMT[args.to]
    n_ok = n_fail = 0
    manifest = open(os.path.join(args.output, "_conversions.jsonl"), "w")
    for batch in out.iter_batches(batch_format="pyarrow"):
        rendered = export_batch(batch, fmt=args.to)
        for did, status, errors, content in zip(
            batch["doc_id"].to_pylist(), batch["status"].to_pylist(),
            batch["errors"].to_pylist(), rendered["content"].to_pylist(),
        ):
            manifest.write(json.dumps(
                {"input": did, "status": status,
                 "errors": list(errors or [])}) + "\n")
            if status == "failure":
                n_fail += 1
                continue
            stem = stem_of[did]
            with open(os.path.join(args.output, stem + ext), "w") as f:
                f.write(content)
            n_ok += 1
    manifest.close()
    print(f"converted {n_ok} ok, {n_fail} failed -> {args.output}")
    ray.shutdown()
    return 0 if n_fail == 0 else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="docling_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    cv = sub.add_parser("convert", help="convert files/directories")
    cv.add_argument("sources", nargs="+")
    cv.add_argument("--to", default="markdown", choices=sorted(_EXT_FMT))
    cv.add_argument("--output", default="out")
    cv.add_argument("--kind", default="",
                    help="input kind override (default: content-sniffed)")
    cv.add_argument("--num-cpus", type=int, default=4)
    cv.set_defaults(fn=cmd_convert)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

"""docling_ray — a Ray-Data-native document extraction engine.

A from-scratch rebuild of the capabilities of the reference engine
(yzkee/docling, see SURVEY.md): interleaved text+media documents in,
reading-ordered span sequences out, expressed as ``ray.data.Dataset``
pipelines (``map_batches`` over Arrow batches, actor pools for warm
parser state, one explicit ``groupby(doc_id)`` shuffle for page
reassembly of giant documents).

Layout:
    functions/   pure, vectorizable text functions (normalization, hashing)
    stages/      per-batch extraction stages (html, text, pdf-cells layout)
    sources/     corpus readers/writers + interleaved-corpus synthesis
    pipelines/   end-to-end pipelines, checkpoint/resume, skew handling
    state/       broadcast/lookup state helpers
"""

__version__ = "0.1.0"

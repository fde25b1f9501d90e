"""Per-kind single-core kernel cost — the reproducible half of the
headline (BASELINE.md quotes this table next to the wall-clock range,
because shared-host wall clocks swing ~2.4x between windows while the
kernel cost mix is stable).

Usage: python tools/perkind.py [n_docs] [seed]

Classifies each generated doc by its dominant input kind, times
``extract_document`` per kind (best of 3 passes), and prints ms/doc,
docs/s/core and the CPU share. Pure single-process — no Ray session.
"""

from __future__ import annotations

import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_docs: int = 4000, seed: int = 77) -> None:
    from docling_ray.stages.assemble import extract_document
    from docling_ray.synth import make_corpus

    inp, _ = make_corpus(n_docs, seed=seed)
    rows = inp.to_pylist()

    def kindof(spans):
        ks = {s["kind"] for s in spans}
        for k in ("pdf_cells", "image", "pdf", "audio", "video", "html"):
            if k in ks:
                return k
        return "media"

    groups = collections.defaultdict(list)
    for r in rows:
        groups[kindof(r["spans"])].append(r)
    for g in groups.values():  # warm imports / lazies
        extract_document(g[0]["spans"])
    best = {}
    for k, g in sorted(groups.items()):
        t = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for r in g:
                extract_document(r["spans"])
            t = min(t, time.perf_counter() - t0)
        best[k] = t
    total_t = sum(best.values())
    total_n = len(rows)
    print(f"{'kind':<10} {'share':>6} {'ms/doc':>8} {'docs/s/core':>12} "
          f"{'cpu share':>10}")
    for k, t in sorted(best.items()):
        n = len(groups[k])
        print(f"{k:<10} {100*n/total_n:>5.1f}% {1000*t/n:>8.2f} "
              f"{n/t:>12.0f} {100*t/total_t:>9.1f}%")
    print(f"{'aggregate':<10} {'100%':>6} {1000*total_t/total_n:>8.2f} "
          f"{total_n/total_t:>12.0f} {'100%':>10}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 77)

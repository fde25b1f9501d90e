"""Convert-CLI test (docling_ray/cli.py vs reference docling/cli/main.py:706):
mixed unlabeled directory → per-file outputs + a status manifest, failures
recorded as data. Runs in a subprocess because the CLI owns its own Ray
session (the pytest session fixture keeps this process's session)."""

from __future__ import annotations

import base64
import json
import os
import random
import subprocess
import sys


def test_cli_convert_mixed_dir(tmp_path):
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    (src / "a.html").write_text(
        "<html><body><h1>Hello</h1><p>world text</p></body></html>")
    (src / "b.md").write_text("# Title\n\nSome paragraph here.")
    from docling_ray.synth import build_image_doc

    b64, _exp, _status = build_image_doc(random.Random(5), "cli-img")
    (src / "c.png").write_bytes(base64.b64decode(b64))
    (src / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\n junk")

    env = {**os.environ, "PYTHONPATH": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))}
    proc = subprocess.run(
        [sys.executable, "-m", "docling_ray.cli", "convert", str(src),
         "--to", "markdown", "--output", str(out), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=240, env=env,
    )
    # exit 1 = some failures (the broken png), by design
    assert proc.returncode == 1, proc.stderr[-2000:]
    assert (out / "a.md").read_text().startswith("# Hello")
    assert (out / "b.md").exists() and (out / "c.md").exists()
    rows = [json.loads(ln) for ln in
            (out / "_conversions.jsonl").read_text().splitlines()]
    by_input = {os.path.basename(r["input"]): r for r in rows}
    assert by_input["broken.png"]["status"] == "failure"
    assert by_input["broken.png"]["errors"]
    assert by_input["a.html"]["status"] == "success"

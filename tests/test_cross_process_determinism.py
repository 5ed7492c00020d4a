"""Per-turn equality requires cross-process determinism: extraction output
must be byte-identical under different PYTHONHASHSEED values (i.e. across
executors), since set/dict hash randomization must never influence results
(SURVEY §4.3)."""

import hashlib
import os
import subprocess
import sys

SCRIPT = r"""
import hashlib
from cl_readability_spark.pipeline.corpus import build_transcript_rows
from cl_readability_spark.core.extract import extract
h = hashlib.sha256()
for r in build_transcript_rows(12, seed=42):
    res = extract(r[3])
    h.update(repr((res.status, res.extracted_text, res.content_spans, res.title,
                   res.byline, res.excerpt, res.lang, res.retries)).encode())
print(h.hexdigest())
"""


def run_with_seed(seed: str) -> str:
    env = dict(os.environ, PYTHONHASHSEED=seed,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT], env=env, capture_output=True, text=True,
        check=True,
    )
    return out.stdout.strip()


def test_extraction_identical_across_hash_seeds():
    digests = {run_with_seed(s) for s in ("0", "1", "31337")}
    assert len(digests) == 1, digests

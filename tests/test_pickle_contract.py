"""Pin the multimodal UDF cloudpickle-by-value executor contract.

multimodal_image's module docstring promises its mapInPandas UDFs
are shippable WITHOUT the package being importable on executors
(nested functions pickle by value; a module-level function pickles
by reference and dies with ModuleNotFoundError at task time on any
executor lacking the repo on sys.path). Local[N] can never catch a
violation — the Python workers inherit the driver's sys.path — so
these tests round-trip the closures in a subprocess with the repo
stripped from sys.path and run them there.
"""

from __future__ import annotations

import base64
import subprocess
import sys

import cloudpickle

from dist_map_reduce_spark.functions.multimodal_image import (
    _make_p6_decode,
    _make_synth,
    _synth_udf,
)

_RUNNER = """
import base64, pickle, sys
sys.path[:] = [p for p in sys.path if "repo" not in p]
for mod in [m for m in sys.modules if m.startswith("dist_map_reduce")]:
    del sys.modules[mod]
fn = pickle.loads(base64.b64decode({payload!r}))
{body}
"""


def _run_without_repo(obj, body: str) -> str:
    payload = base64.b64encode(cloudpickle.dumps(obj)).decode()
    r = subprocess.run(
        [sys.executable, "-c", _RUNNER.format(payload=payload, body=body)],
        capture_output=True,
        text=True,
        cwd="/tmp",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    return r.stdout.strip()


def test_synth_udf_roundtrips_without_package():
    out = _run_without_repo(
        _synth_udf(_make_synth()),
        "import pandas as pd\n"
        "res = list(fn(iter([pd.DataFrame({'doc_id': [1, 5]})])))\n"
        "print(bytes(res[0]['payload'][0][:2]).decode(),"
        " len(res[0]['payload'][1]))",
    )
    head, size = out.split()
    # doc 5: w = 16+(5%8)*4 = 36, h = 12+(5%5)*4 = 12 → header 12 B
    assert head == "P6" and int(size) == len(b"P6\n36 12\n255\n") + 36 * 12 * 3


def test_p6_decode_roundtrips_without_package():
    out = _run_without_repo(
        _make_p6_decode(),
        "blob = b'P6\\n2 2\\n255\\n' + bytes(range(12))\n"
        "px = fn(blob)\n"
        "print(px.shape, int(px[1, 1, 2]))",
    )
    assert out == "(2, 2, 3) 11"

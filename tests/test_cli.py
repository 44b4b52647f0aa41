"""Management CLI end-to-end (R13): grow a dataset from a user module,
list versions, dump + load a collection round-trip.

One subprocess per command keeps this honest (fresh interpreter, the
way an operator would run it); the dataset module lives in tmp_path and
is imported via module:Class exactly like the reference's
``grow_dataset <Dataset>`` command resolves labels.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DATASET_MODULE = '''
from datagrowth_spark.plans.dataset import Dataset


class TinyDataset(Dataset):
    NAME = "tiny"
    COLLECTION_IDENTIFIER = "id"

    def seed_collection(self, collection):
        n = int(self.config.get("n", 3))
        collection.add([{"id": i, "name": f"doc {i}"} for i in range(n)])
        return collection
'''


def _run(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "datagrowth_spark", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_cli_grow_list_dump_load_roundtrip(tmp_path):
    (tmp_path / "tinyds.py").write_text(DATASET_MODULE)
    warehouse = str(tmp_path / "wh")

    out = _run(["grow-dataset", "tinyds:TinyDataset", "--warehouse", warehouse,
                "-c", "n=4"], cwd=str(tmp_path))
    entry = json.loads(out.strip().splitlines()[-1])
    assert entry["version"] == 1 and entry["is_current"]

    out = _run(["list-versions", "tinyds:TinyDataset", "--warehouse", warehouse,
                "-c", "n=4"], cwd=str(tmp_path))
    meta = json.loads(out.strip().splitlines()[-1])
    assert [v["version"] for v in meta["versions"]] == [1]

    # locate the stored collection parquet snapshot
    # (<root>/<sig>/v001/main-s<K>.parquet)
    stores = [os.path.join(root, d) for root, dirs, _ in os.walk(warehouse)
              for d in dirs
              if d == "main.parquet" or (d.startswith("main-s")
                                         and d.endswith(".parquet"))]
    assert stores, f"no collection dir under {warehouse}"
    src = stores[0]

    dump = str(tmp_path / "dump")
    _run(["dump-collection", src, dump, "--fmt", "jsonl"], cwd=str(tmp_path))
    assert any(name.endswith(".json") for name in os.listdir(dump))

    restored = str(tmp_path / "restored")
    out = _run(["load-collection", dump, restored, "--fmt", "jsonl"], cwd=str(tmp_path))
    assert "loaded 4 documents" in out


def test_cli_curate_writes_verdicts(tmp_path):
    out = _run(["curate", "/root/testdata/sf0.001", str(tmp_path / "verdicts")],
               cwd=str(tmp_path))
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["documents"] == 500
    assert 0 < payload["kept"] <= payload["documents"]
    assert os.path.isdir(tmp_path / "verdicts")

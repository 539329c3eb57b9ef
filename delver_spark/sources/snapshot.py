"""Versioned-parquet snapshot store — the crawl's checkpoint/resume layer.

Iceberg-snapshot semantics without the Iceberg runtime jar (offline env;
SURVEY §7 step 5): each committed round writes immutable state dirs plus a
``manifest.json`` that is renamed into place LAST. A crawl killed mid-round
leaves a stale manifest → resume re-reads the last committed round exactly
(T8: failed round = no commit). Append-only tables (crawl_order, documents,
lineage) are per-round part directories listed by the manifest, so an
uncommitted round's parts are invisible.

On a real deployment this maps 1:1 onto Iceberg table snapshots
(``writeTo(...).append()`` + snapshot expiry); the semantics the engine
relies on — atomic visibility of a round's writes — are identical.
"""

from __future__ import annotations

import json
import os
import shutil



class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def last_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def commit(self, manifest: dict):
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path())  # atomic commit point

    # -- state dirs ----------------------------------------------------------
    def state_dir(self, name: str, rnd: int) -> str:
        return os.path.join(self.root, name, f"round_{rnd:06d}")

    def part_dirs(self, name: str, upto_round: int) -> list[str]:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return []
        out = []
        for d in sorted(os.listdir(base)):
            if d.startswith("round_") and int(d[6:]) <= upto_round:
                p = os.path.join(base, d)
                if os.path.isdir(p) and os.listdir(p):
                    out.append(p)
        return out

    # -- bloom ------------------------------------------------------------------
    def save_bloom(self, rnd: int, blob: bytes):
        d = os.path.join(self.root, "bloom")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"round_{rnd:06d}.bloom"), "wb") as f:
            f.write(blob)

    def load_bloom(self, rnd: int) -> bytes:
        with open(os.path.join(self.root, "bloom", f"round_{rnd:06d}.bloom"), "rb") as f:
            return f.read()

    def gc(self, keep_from_round: int):
        """Drop state dirs older than the last committed round (append-only
        part dirs are kept — they are the output tables)."""
        for name in ("frontier", "url_store"):
            base = os.path.join(self.root, name)
            if not os.path.isdir(base):
                continue
            for d in sorted(os.listdir(base))[:-2]:
                if d.startswith("round_") and int(d[6:]) < keep_from_round:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)

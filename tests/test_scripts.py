"""Ops-script smoke tests: the disaster-recovery contract (SURVEY §5.3 —
reference scripts/sync_qdrant_stats.py / build_sparse_vectors.py)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _seed_store(temp_root, n=12):
    from voitta_rag_tpu.core_types import ChunkMetadata
    from voitta_rag_tpu.index.store import (
        get_vector_store, reset_vector_store,
    )

    reset_vector_store()  # the singleton may carry a prior test's paths
    store = get_vector_store()
    rng = np.random.default_rng(0)
    kb = temp_root / "kb"
    kb.mkdir(exist_ok=True)
    texts, metas = [], []
    for i in range(n):
        p = kb / f"f{i // 3}.md"
        p.write_text(f"file {i // 3} body")
        texts.append(f"chunk {i} searchable text body")
        metas.append(ChunkMetadata(
            file_path=f"kb/f{i // 3}.md", file_name=f"f{i // 3}.md",
            folder_path="kb", index_folder="kb", chunk_index=i % 3,
            total_chunks=3, start_char=0, end_char=10,
            indexed_at="2026-08-17T00:00:00Z"))
    dense = rng.standard_normal((n, store.dimension)).astype(np.float32)
    store.store_chunks(texts, dense, metas)
    store.save()
    return store


def _run(script):
    # temp_root's monkeypatched VOITTA_* env vars are inherited, so the
    # subprocess operates on the same root/db/index as the test process.
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run([sys.executable, str(REPO / "scripts" / script)],
                          capture_output=True, text=True, env=env,
                          timeout=300)


def test_rebuild_index_stats(temp_root, monkeypatch):
    """Payload store → SQLite indexed_files recovery after 'disaster'."""
    from voitta_rag_tpu.db.database import get_db, init_db, reset_db

    _seed_store(temp_root)
    # Disaster: the SQLite bookkeeping is lost (fresh DB).
    proc = _run("rebuild_index_stats.py")
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "rebuilt 4 indexed_files rows from 12 chunks" in proc.stdout

    init_db()
    recs = get_db().indexed_files_under("kb")
    assert len(recs) == 4
    by_path = {r.file_path: r for r in recs}
    assert by_path["kb/f0.md"].chunk_count == 3
    assert by_path["kb/f0.md"].content_hash  # recomputed from disk
    reset_db()


def test_rebuild_sparse_vectors(temp_root, monkeypatch):
    """Sparse backfill populates term slots for dense-only chunks."""
    store = _seed_store(temp_root)
    store.close()
    proc = _run("rebuild_sparse_vectors.py")
    assert proc.returncode == 0, proc.stderr[-800:]

    from voitta_rag_tpu.index.store import TpuVectorStore
    from voitta_rag_tpu.search.sparse_text import get_sparse_embedding_service

    s2 = TpuVectorStore(index_dir=None)
    try:
        # A hybrid query over the backfilled terms finds the right chunk.
        sv = get_sparse_embedding_service().embed_query(
            "chunk 7 searchable text body")
        rng = np.random.default_rng(0)
        dense = rng.standard_normal((12, s2.dimension)).astype(np.float32)
        q = dense[7] / np.linalg.norm(dense[7])
        hits = s2.search(q, limit=3, sparse_query=sv, sparse_weight=0.5)
        assert hits and hits[0].text == "chunk 7 searchable text body"
    finally:
        s2.close()


def test_import_repos_end_to_end(tmp_path):
    """scripts/import_repos.py against a live app subprocess: creates the
    folder, configures the github source, enables indexing, triggers sync,
    and polls to a terminal status (reference scripts/import_repos.py
    contract). The repo is nonexistent so the sync lands on 'error' —
    the script must still drive the full sequence and terminate."""
    import json
    import os
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    root = tmp_path / "root"
    root.mkdir()
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "VOITTA_ROOT_PATH": str(root),
        "VOITTA_DB_PATH": str(tmp_path / "app.db"),
        "VOITTA_PORT": str(port),
        "EMBEDDING_MODEL": "test-tiny",
        "EMBEDDING_DIMENSION": "64",
        "VOITTA_MAX_SEQ_LEN": "32",
        "INDEXING_POLL_INTERVAL": "3600",
    })
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    app = subprocess.Popen(
        [sys.executable, "-m", "voitta_rag_tpu.api.app"], env=env,
        cwd=repo_dir, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        base = f"http://127.0.0.1:{port}"
        for _ in range(120):
            try:
                urllib.request.urlopen(base + "/", timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise AssertionError("app did not become ready")

        cfg = tmp_path / "import.json"
        cfg.write_text(json.dumps({
            "base_url": base,
            "user": "importer",
            "hosts": {"github.com": {"auth_method": "token",
                                     "username": "x", "pat": "nope"}},
            "folders": {"repos": ["no-such-org/no-such-repo@main"]},
        }))
        proc = subprocess.run(
            [sys.executable, "scripts/import_repos.py", str(cfg)],
            cwd=repo_dir, env=env, capture_output=True, text=True,
            timeout=300)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "sync error" in proc.stdout or "sync synced" in proc.stdout, (
            proc.stdout, proc.stderr[-1000:])

        # The source was configured and reached a terminal state.
        req = urllib.request.Request(
            base + "/api/sync/repos/no-such-repo",
            headers={"Cookie": "voitta_user=importer"})
        data = json.loads(urllib.request.urlopen(req, timeout=5).read())
        assert data["source_type"] == "github"
        assert data["gh_repo"] == "no-such-org/no-such-repo"
        assert data["sync_status"] in ("error", "synced")
    finally:
        app.terminate()
        app.wait(timeout=10)


def test_export_repos_round_trip(temp_root, capsys):
    """export_repos dumps github sources in the import-config format with
    secrets stripped (reference scripts/export_repos.py contract)."""
    import importlib.util
    import json
    import os
    import sys

    from voitta_rag_tpu.db import database as dbmod
    from voitta_rag_tpu.db.models import FolderSyncSource

    dbmod.reset_db()
    db = dbmod.get_db()
    db.upsert_sync_source(FolderSyncSource(
        folder_path="repos/alpha", source_type="github",
        gh_repo="org/alpha", gh_branch="main", gh_auth_method="token",
        gh_username="bot", gh_pat="SECRET"))
    db.upsert_sync_source(FolderSyncSource(
        folder_path="repos/beta", source_type="github", gh_repo="org/beta"))
    db.upsert_sync_source(FolderSyncSource(
        folder_path="sp", source_type="sharepoint"))  # skipped

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_repos", os.path.join(repo_dir, "scripts", "export_repos.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = ["export_repos.py"]
    try:
        assert mod.main() == 0
    finally:
        sys.argv = old_argv
    out = json.loads(capsys.readouterr().out)
    assert out["folders"]["repos"] == ["org/alpha@main", "org/beta"]
    assert out["hosts"]["github.com"]["username"] == "bot"
    assert "SECRET" not in json.dumps(out)
    dbmod.reset_db()

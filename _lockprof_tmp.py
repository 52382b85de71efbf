import time, threading, tempfile, json
import numpy as np
from datetime import datetime, timezone
from voitta_rag_tpu.core_types import ChunkMetadata, SparseVector
from voitta_rag_tpu.index.store import TpuVectorStore

holds = []  # (duration_ms, site)
class TimedLock:
    def __init__(self, inner): self._inner = inner; self._t0 = None
    def __enter__(self):
        self._inner.acquire(); self._t0 = time.perf_counter()
    def __exit__(self, *a):
        import traceback
        dt = (time.perf_counter() - self._t0) * 1000
        if dt > 20:
            st = traceback.extract_stack()
            names = [f.name for f in st if 'store.py' in f.filename or 'compact' in f.name]
            site = '>'.join(names[-4:]) or '?'
            holds.append((round(dt,1), site))
        self._inner.release()
    def acquire(self, *a, **k): return self._inner.acquire(*a, **k)
    def release(self): return self._inner.release()

tmp = tempfile.mkdtemp(prefix="lockprof_")
store = TpuVectorStore(index_dir=tmp, collection="lp", dimension=768)
store._lock = TimedLock(store._lock)
now = datetime.now(timezone.utc).isoformat()
rng = np.random.default_rng(11)

def meta_for(fp, i, total):
    return ChunkMetadata(file_path=fp, folder_path="bench", index_folder="bench",
        file_name=fp, chunk_index=i, total_chunks=total, start_char=0, end_char=10, indexed_at=now)

def batch(fp, n):
    emb = rng.standard_normal((n, 768)).astype(np.float32)
    svs = [SparseVector(indices=rng.integers(0, 30000, 8).tolist(),
                        values=rng.random(8).astype(np.float32).tolist()) for _ in range(n)]
    return ([f"c {fp} {i}" for i in range(n)], emb, [meta_for(fp, i, n) for i in range(n)], svs)

BI = 4096
for lo in range(0, 32768, BI):
    t,e,m,s = batch(f"bench/base_{lo}.md", BI); store.store_chunks(t,e,m,s)
print("ingested")
q = rng.standard_normal(768).astype(np.float32)
sq = ([int(x) for x in rng.integers(0,30000,8)], [float(x) for x in rng.random(8)])
for _ in range(4): store.search(q, limit=10, sparse_query=sq, sparse_weight=0.1)

holds.clear()
stop = threading.Event()
def writer():
    wi = 0
    while not stop.is_set():
        t,e,m,s = batch(f"bench/w_{wi}.md", 512); store.store_chunks(t,e,m,s)
        if wi % 2 == 1:
            store.delete_by_file(f"bench/base_{(wi//2)*BI}.md")
        if wi == 6:
            store.compact(min_waste_fraction=0.01)
        wi += 1
th = threading.Thread(target=writer, daemon=True); th.start()
lat = []
for i in range(150):
    t0 = time.perf_counter()
    store.search(q, limit=10, sparse_query=sq, sparse_weight=0.1)
    lat.append((time.perf_counter()-t0)*1000)
stop.set(); th.join(timeout=60)
lat = np.array(lat)
print("p50/p95/p99:", round(float(np.percentile(lat,50)),1), round(float(np.percentile(lat,95)),1), round(float(np.percentile(lat,99)),1))
from collections import defaultdict
agg = defaultdict(lambda: [0,0.0,0.0])
for d, s in holds:
    a = agg[s]; a[0]+=1; a[1]+=d; a[2]=max(a[2],d)
for s,(n,tot,mx) in sorted(agg.items(), key=lambda kv:-kv[1][2]):
    print(f"{s}: n={n} total={tot:.0f}ms max={mx:.0f}ms")
store.close()
import shutil; shutil.rmtree(tmp, ignore_errors=True)

"""Plant schema-legal NULL rows (events value/event_type/user_id/props,
documents.text, embeddings.embedding) and gate the WHOLE surface."""
import sys, shutil
from pathlib import Path
import pyarrow as pa, pyarrow.parquet as pq
sys.path.insert(0, "/root/repo")
from kinesis_test_spark.oracle import check_query
from kinesis_test_spark.session import get_spark
from kinesis_test_spark import registry
registry.load_all()

SRC = "/root/testdata/sf0.001"
d = Path("/tmp/nulls_sf"); shutil.rmtree(d, ignore_errors=True); d.mkdir()
for f in Path(SRC).glob("*.parquet"):
    shutil.copy(f, d / f.name)

ev = pq.read_table(d / "events.parquet")
h = ev.slice(0, 4).to_pydict()
extra = pa.table({
    "event_id": [92000000, 92000001, 92000002, 92000003],
    "ts": h["ts"],
    "user_id": [h["user_id"][0], h["user_id"][1], None, h["user_id"][3]],
    "event_type": [h["event_type"][0], None, h["event_type"][2], h["event_type"][3]],
    "value": [None, h["value"][1], h["value"][2], h["value"][3]],
    "props": [h["props"][0], h["props"][1], h["props"][2], None],
}, schema=ev.schema)
pq.write_table(pa.concat_tables([ev, extra]), d / "events.parquet")

docs = pq.read_table(d / "documents.parquet")
dx = pa.table({
    "doc_id": [92000010],
    "text": [None],
    "lang": ["en"],
    "source": ["edge"],
    "n_chars": [None],
}, schema=docs.schema)
pq.write_table(pa.concat_tables([docs, dx]), d / "documents.parquet")

emb = pq.read_table(d / "embeddings.parquet")
ex = pa.table({
    "vec_id": [92000011],
    "embedding": [None],
    "label": [None],
}, schema=emb.schema)
pq.write_table(pa.concat_tables([emb, ex]), d / "embeddings.parquet")

spark = get_spark()
fails = {}
keys = sorted(registry.QUERIES)
for i, name in enumerate(keys):
    try:
        problems = check_query(spark, str(d), name)
        status = "OK" if not problems else "; ".join(problems)[:220]
    except Exception as exn:
        status = f"ERROR {type(exn).__name__}: {str(exn)[:220]}"
    if status != "OK":
        fails[name] = status
        print(f"FAIL {name}: {status}", flush=True)
    if (i+1) % 50 == 0:
        print(f"... {i+1}/{len(keys)}", flush=True)
print("NULLPROBE-DONE", len(keys), "keys,", len(fails), "failures")

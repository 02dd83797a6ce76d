"""Dump .explain('formatted') for named queries to plans/r15/<q>_<tag>.txt.

Usage: python tools/dump_r15_plan.py <tag> <sf_dir> <query> [...]
"""
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dax_ppdb_spark.session import get_spark  # noqa: E402
from dax_ppdb_spark import driver_queries  # noqa: E402

tag, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
spark = get_spark("dump-r15-plans")
spark.sparkContext.setLogLevel("ERROR")
registry = driver_queries.all_queries()
driver_queries.ensure_sky_sorted(spark, sf_dir)
os.makedirs(os.path.join(REPO, "plans", "r15"), exist_ok=True)
for name in names:
    df = registry[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    out = os.path.join(REPO, "plans", "r15", f"{name}_{tag}.txt")
    with open(out, "w") as fh:
        fh.write(f"# {name} @ {sf_dir} ({tag})\n\n")
        fh.write(buf.getvalue())
    print(f"wrote {out}")
spark.stop()

"""bench.py's query lists must always resolve against the registry — a
rename that orphans a name would crash the driver's per-round bench run
and silently cost the round its BENCH artifact. Metadata-only: no Spark
session needed (conftest's sys.path insert makes `import bench` work)."""

from __future__ import annotations

import bench

from sms_db_spark.plans import registry


def test_bench_names_resolve_and_buckets_are_disjoint():
    specs = registry()
    missing = [n for n in bench.HEADLINE + bench.WRITE_AUDITS if n not in specs]
    assert not missing, missing
    overlap = set(bench.HEADLINE) & set(bench.WRITE_AUDITS)
    assert not overlap, f"a query must live in exactly one bucket: {overlap}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.WRITE_AUDITS)) == len(bench.WRITE_AUDITS)

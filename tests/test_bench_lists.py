"""bench.py's query lists must always resolve against the registry — a
rename that orphans a name would crash the driver's per-round bench run
and silently cost the round its BENCH artifact."""

from __future__ import annotations

import importlib.util
import os


def _bench():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_names_resolve_and_buckets_are_disjoint(spark):
    from sms_db_spark.plans import registry

    bench = _bench()
    specs = registry()
    missing = [n for n in bench.HEADLINE + bench.WRITE_AUDITS if n not in specs]
    assert not missing, missing
    overlap = set(bench.HEADLINE) & set(bench.WRITE_AUDITS)
    assert not overlap, f"a query must live in exactly one bucket: {overlap}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.WRITE_AUDITS)) == len(bench.WRITE_AUDITS)

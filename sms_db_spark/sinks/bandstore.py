"""Persisted MinHash band store + incremental near-dup pairing: the
batch complement the streaming near-dup docstring promises ("deep
history stays a batch join against the band store",
streaming/neardup.py:19) but nothing implemented until now.

The problem at 100 TB: q45 re-bands and re-buckets the WHOLE corpus per
run — correct for a one-shot audit, quadratic waste for a daily delta.
The store shape fixes the asymmetry:

  - `write_band_store` bands the corpus ONCE (the same stateless
    band_rows expression q44/q45/q152 bind) and persists
    (doc_id, band_id, band_hash) partitioned by a hash bucket of the
    band key (`_bucket=K` dirs). Banding is map-side; the write is one
    repartition by bucket. Store size is 8 small rows per document —
    ~1% of a text corpus.
  - `delta_neardup_pairs` bands only the delta, broadcast-SEMI-joins
    the store on (bucket, band_id, band_hash) — the store scan is
    map-side, no shuffle of history, and the `_bucket` partition
    column gives Catalyst a dynamic-partition-pruning handle so a
    small delta touches only its buckets' directories — then groups
    ONLY the matched rows (bounded by |delta bands| x bucket size) and
    expands pairs in-bucket exactly like lsh_candidate_pairs.

Semantics contract (pinned by tests/test_bandstore.py): the emitted
pair set equals q45's batch pairs over the UNION corpus (same
hot-bucket cap, measured on the union bucket size) restricted to pairs
involving at least one delta document. Delta doc_ids must be disjoint
from store doc_ids (fold a paired delta in with mode='append' AFTER
pairing); a doc present on both sides would pair with itself-as-history
and is the caller's bug, not a silent dedup here.

Store metadata (`_band_meta.json`, written atomically) records the
bucket count and the banding parameters; `mode='append'` refuses a
mismatched store — appending bands hashed under a different bucket
count would silently split buckets and lose pairs.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsutil import read_text, write_text_atomic
from ..operators.dedup import (
    BAND_SIZE,
    LSH_MAX_BUCKET,
    NUM_HASHES,
    band_rows,
    bucket_cap_filter,
    bucket_pair_expr,
)

N_BAND_BUCKETS = 64
_META_NAME = "_band_meta.json"
# the store's fixed on-disk schema (band_rows' output + the bucket
# partition column) — read with it explicitly: inference would fail on
# a legitimately-empty store (meta present, zero banded rows) and costs
# a footer pass per call otherwise
STORE_SCHEMA = "doc_id bigint, band_id bigint, band_hash string, _bucket int"
# above this many distinct delta band keys, skip the broadcast hint and
# let Catalyst/AQE pick the join (a forced broadcast of a huge catch-up
# delta would die on driver/broadcast memory instead of degrading to a
# shuffle semi join)
BROADCAST_KEY_LIMIT = 2_000_000


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("band_id", "band_hash"), F.lit(n_buckets)).cast("int")


def _meta_path(path: str) -> str:
    return path.rstrip("/") + "/" + _META_NAME


def read_band_meta(spark: SparkSession, path: str) -> dict:
    text = read_text(spark, _meta_path(path))
    if text is None:
        raise ValueError(f"band store at {path} has no {_META_NAME}")
    return json.loads(text)


def write_band_store(
    docs: DataFrame,
    path: str,
    n_buckets: int = N_BAND_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Band docs (doc_id, text) and persist under `_bucket=K` partition
    dirs. mode='append' folds a new slice into an existing store (AFTER
    pairing it — see module contract) and refuses a store whose banding
    parameters differ from this build's."""
    spark = docs.sparkSession
    if mode not in ("overwrite", "append"):
        # e.g. 'ignore' would no-op the data write yet re-stamp the
        # metadata below — a silently parameter-mismatched store
        raise ValueError(f"write_band_store: mode must be overwrite|append, got {mode!r}")
    meta = {
        "n_buckets": n_buckets,
        "num_hashes": NUM_HASHES,
        "band_size": BAND_SIZE,
    }
    if mode == "append":
        have = read_band_meta(spark, path)
        if have != meta:
            raise ValueError(
                f"band store parameter mismatch: store {have}, build {meta} — "
                "appending would split buckets; rewrite the store instead"
            )
    bands = band_rows(docs).withColumn("_bucket", _bucket_col(n_buckets))
    (
        bands.repartition(n_buckets, "_bucket")
        .write.mode(mode)
        .partitionBy("_bucket")
        .parquet(path)
    )
    if mode != "append":
        write_text_atomic(spark, _meta_path(path), json.dumps(meta))


def delta_neardup_pairs(
    spark: SparkSession,
    delta_docs: DataFrame,
    store_path: str,
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """Near-dup candidate pairs (doc_a < doc_b) involving at least one
    delta document, against the banded history at store_path — without
    re-banding or shuffling the history.

    Shape: band the delta map-side; broadcast its distinct band keys
    into a LEFT SEMI join against the store (map-side scan; `_bucket`
    in the join key hands Catalyst the partition-pruning handle);
    union the surviving history rows with the delta's own bands; ONE
    shuffle groups just those rows per (band_id, band_hash); the
    hot-bucket cap measures the UNION bucket size (q45's exact cap
    law on the union corpus — a bucket that q45 would drop is dropped
    here even when the delta alone is small); pair expansion is
    map-side over the sorted in-bucket array, keeping pairs with a
    delta member.
    """
    meta = read_band_meta(spark, store_path)
    n_buckets = int(meta["n_buckets"])
    if (int(meta["num_hashes"]), int(meta["band_size"])) != (NUM_HASHES, BAND_SIZE):
        raise ValueError(
            f"band store at {store_path} was built with "
            f"{meta['num_hashes']}x{meta['band_size']} banding; this build "
            f"is {NUM_HASHES}x{BAND_SIZE} — signatures are incomparable"
        )
    store = spark.read.schema(STORE_SCHEMA).parquet(store_path).select(
        "doc_id", "band_id", "band_hash", "_bucket"
    )
    # the banding fold is the dominant per-row cost (see band_rows);
    # pin it so the keys branch and the union branch share ONE
    # evaluation instead of re-running the signature expression twice.
    # persist, NOT localCheckpoint (ADVICE r9): checkpoint blocks have
    # no release API short of context shutdown, so a long-lived daily
    # driver would accumulate one delta's blocks per run; a cached
    # frame is released deterministically by release_delta_pin below.
    delta = band_rows(delta_docs).withColumn("_bucket", _bucket_col(n_buckets)).persist()
    keys = delta.select("_bucket", "band_id", "band_hash").distinct()
    # this count is the action that materializes the pinned delta; its
    # result decides the hint (a forced broadcast of a huge catch-up
    # delta would die on driver memory instead of degrading to shuffle)
    if keys.count() <= BROADCAST_KEY_LIMIT:
        keys = F.broadcast(keys)
    union = (
        store.join(keys, ["_bucket", "band_id", "band_hash"], "left_semi")
        .withColumn("is_delta", F.lit(False))
        .unionByName(delta.withColumn("is_delta", F.lit(True)))
    )
    buckets = union.groupBy("band_id", "band_hash").agg(
        # struct sorts by its first field, so the array is doc_id-ordered
        # and pair expansion emits doc_a < doc_b directly
        F.array_sort(F.collect_set(F.struct("doc_id", "is_delta"))).alias("docs")
    )
    pairs = (
        # cap + expansion are dedup.py's shared law — the keep predicate
        # drops history-history pairs after the cap is applied to the
        # full union bucket
        bucket_cap_filter(buckets, max_bucket)
        .select(
            F.explode(
                bucket_pair_expr(".doc_id", "x.is_delta OR y.is_delta")
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    # hand the pin's lifetime to the caller: the result is lazy, so the
    # cached delta must outlive it — release_delta_pin(pairs) after the
    # result is materialized (consuming pairs afterwards stays correct,
    # it just re-evaluates the banding per plan branch). The pin rides
    # the frame as an attribute AND is tracked in _LIVE_PINS: any
    # transformation of the result (.filter/.repartition/...) yields a
    # fresh DataFrame without the attribute, so the attribute alone
    # could silently lose the lifecycle — the registry makes the no-arg
    # release_delta_pin() a catch-all that cannot miss.
    pairs._delta_pin = delta
    _LIVE_PINS.append(delta)
    if len(_LIVE_PINS) >= _PIN_WARN_THRESHOLD:
        import warnings

        # UserWarning, NOT ResourceWarning: CPython's default filters
        # IGNORE ResourceWarning, so a plain `python driver.py` would
        # never see it and the leak-visibility this exists for would be
        # silently off exactly where it matters (review r10)
        warnings.warn(
            f"{len(_LIVE_PINS)} delta pins are live and unreleased — a "
            "driver that never calls release_delta_pin() accumulates one "
            "cached delta per run (the exact leak the pin API exists to "
            "prevent); call release_delta_pin() after each run's pairs "
            "are materialized",
            UserWarning,
            stacklevel=2,
        )
    return pairs


# delta pins not yet released, in creation order. Not thread-guarded:
# the daily-delta driver this module targets runs one delta at a time;
# concurrent pairing from multiple threads should release per-frame.
# The list holds STRONG references by design — a weakref registry would
# lose the handle the unpersist needs once the caller drops theirs — so
# a driver that never releases grows it one entry per run; the warning
# above makes that visible long before it matters.
_LIVE_PINS: list[DataFrame] = []
_PIN_WARN_THRESHOLD = 16


def release_delta_pin(pairs: DataFrame | None = None) -> None:
    """Release the cached delta bands behind a delta_neardup_pairs
    result. Call once the pairs are materialized (written / collected /
    folded into the store): the long-lived daily-delta driver this
    module is designed for would otherwise accumulate one delta's
    cached blocks per run until context shutdown (ADVICE r9).

    With `pairs`: releases that result's pin — but ONLY the exact frame
    delta_neardup_pairs returned carries it; a derived frame
    (.filter()/.repartition()/...) does not. Passing a pin-less frame
    while pins are live warns (ADVICE r10: the miss was a SILENT no-op
    — the caller believes the cache is freed while the pin lives until
    the threshold warning or a no-arg drain) and points at the no-arg
    form. With NO argument: releases EVERY pin this process has created
    and not yet released — the robust per-run epilogue for a driver
    that transforms the result before releasing. Idempotent either
    way."""
    if pairs is None:
        while _LIVE_PINS:
            _LIVE_PINS.pop().unpersist()
        return
    pin = getattr(pairs, "_delta_pin", None)
    if pin is None:
        if _LIVE_PINS:
            import warnings

            warnings.warn(
                "release_delta_pin(pairs) got a frame with no _delta_pin "
                "(a filter/repartition/select derivative loses the "
                f"attribute) while {len(_LIVE_PINS)} pin(s) are live — "
                "nothing was released; pass the exact frame "
                "delta_neardup_pairs returned, or call the no-arg "
                "release_delta_pin() to drain every live pin",
                UserWarning,
                stacklevel=2,
            )
        return
    pin.unpersist()
    try:
        _LIVE_PINS.remove(pin)
    except ValueError:
        pass  # already released via the no-arg catch-all

"""Distributed (native xml source) staging path vs the ElementTree path:
same canonical messages modulo id assignment order (S1, SURVEY.md §7d)."""

from __future__ import annotations

from sms_db_spark.sinks.xml_export import export_xml
from sms_db_spark.sources.canonical import finalize_import
from sms_db_spark.sources.xml_source import (
    normalize_xml,
    read_xml_staging,
    read_xml_staging_distributed,
)
from tests.fixtures import xml_frames


def test_distributed_xml_same_hashes(spark, tmp_path):
    res = finalize_import(*normalize_xml(*xml_frames(spark)))
    out = tmp_path / "backup.xml"
    export_xml(res.messages, res.parts, str(out))

    et_staged = read_xml_staging(spark, str(out))
    dist_staged = read_xml_staging_distributed(spark, str(out))

    et_res = finalize_import(*normalize_xml(*et_staged))
    dist_res = finalize_import(*normalize_xml(*dist_staged))

    et_hashes = {r["hash"] for r in et_res.messages.collect()}
    dist_hashes = {r["hash"] for r in dist_res.messages.collect()}
    assert et_hashes == dist_hashes
    assert et_res.messages.count() == dist_res.messages.count() == 5

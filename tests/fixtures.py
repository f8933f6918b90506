"""Compatibility shim: fixture frames moved into the package
(sms_db_spark/sources/demo.py) so the importer pipeline can be registered
as driver-visible queries()."""

from sms_db_spark.sources.demo import (  # noqa: F401
    JPEG_BYTES,
    bugle_frames,
    signal_frames,
    xml_frames,
)

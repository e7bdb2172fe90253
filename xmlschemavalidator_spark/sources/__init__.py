"""Sources: table readers feeding the validation engine.

* :mod:`readers` — parquet/json/csv/orc with schema assertion and
  validate-on-read;
* :mod:`warc` — Common-Crawl-style WARC archives parsed into the
  input_hint pages shape (binaryFile scan + Arrow-batched record parser).
"""

from xmlschemavalidator_spark.sources.readers import read_table, validated_read
from xmlschemavalidator_spark.sources.warc import read_warc, write_fake_warc

__all__ = ["read_table", "validated_read", "read_warc", "write_fake_warc"]

"""Structured Streaming front-end: the same compiled rulesets evaluated
over unbounded inputs (readStream → rule projection → writeStream)."""

from xmlschemavalidator_spark.streaming.validate_stream import (
    stream_validate,
    windowed_violation_counts,
)

__all__ = ["stream_validate", "windowed_violation_counts"]

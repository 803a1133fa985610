"""Engine configuration with fail-fast validation.

Mirrors the reference's ``Config`` / ``ProcessingConfig`` /
``ResourceLimits`` (``src/config.rs:11-22,262-275,317-327``) and its
``validate()`` fail-fast step (``src/config.rs:43-49``) — the only
"semantic analysis" the reference performs.  Kafka SASL/SSL knobs have
no analog here (the source is an Iceberg/parquet stream); resource
knobs map onto Spark trigger / admission options instead of a custom
ResourceManager (backpressure is engine-built-in via
``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` + unified memory).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


@dataclass(frozen=True)
class ProcessingConfig:
    """Reference defaults: batch 100 / 500 ms / workers=cpus / dedup 300 s
    (``src/config.rs:262-275``)."""

    batch_timeout_ms: int = 500          # → trigger processingTime
    max_files_per_trigger: int = 1       # → source admission (T1/T3)
    # The watermark delay IS the dedup window in Spark's model (X2+T4):
    # dropDuplicatesWithinWatermark holds key state for exactly this long,
    # which matches the reference's dedup_window (src/config.rs:270).
    watermark_delay_s: int = 300
    window_s: int = 600                  # tumbling stats window (A3/T5)
    shuffle_partitions: int = 32
    salt_buckets: int = 8                # skew salting (T2)

    def validate(self) -> "ProcessingConfig":
        for name in ("batch_timeout_ms", "max_files_per_trigger",
                     "watermark_delay_s", "window_s", "shuffle_partitions", "salt_buckets"):
            if getattr(self, name) <= 0:
                raise ConfigError(f"{name} must be > 0")
        return self


@dataclass(frozen=True)
class FilterConfig:
    """WHERE-clause config analog of ``EventFilter`` defaults: source
    allowlist (cf. target program IDs ``src/processors/dex_processor.rs:38-51``)
    and min token threshold (cf. ``min_amount`` F4)."""

    source_allowlist: tuple[str, ...] = ()   # empty = pass all (filters.rs:46-50)
    min_n_tok: int = 0
    max_n_tok: int | None = None

    def validate(self) -> "FilterConfig":
        if self.min_n_tok < 0:
            raise ConfigError("min_n_tok must be >= 0")
        if self.max_n_tok is not None and self.max_n_tok < self.min_n_tok:
            raise ConfigError("max_n_tok must be >= min_n_tok")
        return self


@dataclass(frozen=True)
class EngineConfig:
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    filters: FilterConfig = field(default_factory=FilterConfig)
    checkpoint_dir: str | None = None
    output_dir: str | None = None

    def validate(self) -> "EngineConfig":
        self.processing.validate()
        self.filters.validate()
        return self

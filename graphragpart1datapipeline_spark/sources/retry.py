"""Retry with exponential backoff + jitter for external-source fetchers.

The reference ships retry/backoff inside its network layer
(utils/network_helpers.py:24-98: exponential backoff, bounded attempts,
retry on transient HTTP errors). The engine keeps fetchers injected
(sources/cache.py, sources/paginated.py run them inside mapInPandas
tasks), so the helper here is a WRAPPER the user applies to any
fetcher before injection:

    fetch = with_retries(flaky_fetch, retries=5)
    fetch_with_cache(spark, keys, cache, fetch, schema)

Runs executor-side inside the task that calls the fetcher — each
partition's fetch stream retries independently, which is exactly the
per-request granularity the reference has. Spark's own task retries
(``spark.task.maxFailures``) stay the coarse backstop above this.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from functools import wraps
from typing import TypeVar

T = TypeVar("T")


def retry_call(
    fn: Callable[..., T],
    *args,
    retries: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    backoff: float = 2.0,
    jitter: float = 0.1,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
    **kwargs,
) -> T:
    """Call ``fn(*args, **kwargs)``; on a ``retry_on`` exception wait
    ``base_delay * backoff**attempt`` seconds (capped at ``max_delay``,
    ± ``jitter`` fraction of uniform noise) and try again, up to
    ``retries`` retries (so ``retries + 1`` total attempts). The final
    failure re-raises the original exception.

    ``sleep`` and ``rng`` are injectable for deterministic tests — the
    same seam the reference's tests use for its backoff helper
    (network_helpers.py:24-98).
    """
    rng = rng or random.Random()
    last: BaseException | None = None
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except retry_on as exc:  # noqa: PERF203 — retry loop by design
            last = exc
            if attempt == retries:
                raise
            delay = min(base_delay * (backoff**attempt), max_delay)
            if jitter:
                delay *= 1.0 + jitter * (2.0 * rng.random() - 1.0)
            sleep(max(delay, 0.0))
    raise last  # pragma: no cover — unreachable (loop either returns or raises)


def with_retries(
    fn: Callable[..., T],
    retries: int = 5,
    base_delay: float = 1.0,
    max_delay: float = 60.0,
    backoff: float = 2.0,
    jitter: float = 0.1,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> Callable[..., T]:
    """Wrap ``fn`` so every call goes through :func:`retry_call` with
    the given policy. Picklable as long as ``fn`` is (executors get the
    wrapper through cloudpickle like any injected fetcher)."""

    @wraps(fn)
    def wrapped(*args, **kwargs) -> T:
        return retry_call(
            fn,
            *args,
            retries=retries,
            base_delay=base_delay,
            max_delay=max_delay,
            backoff=backoff,
            jitter=jitter,
            retry_on=retry_on,
            sleep=sleep,
            rng=rng,
            **kwargs,
        )

    return wrapped

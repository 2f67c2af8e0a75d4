"""Tunneled-device warmup.

On a tunneled/remote TPU (the axon PJRT plugin), the *first* device->host
transfer of a process stalls for minutes establishing the reverse channel;
every subsequent transfer runs at full speed (measured: first 8-byte fetch
100-450s, second 0.03s, 10MB thereafter ~0.6s). Anything that materializes a
device array on host — including jit *lowering* when a device array is
captured as a closure constant — pays that cost.

``warm_transfer_async()`` fires a daemon thread that performs one tiny
device->host fetch immediately, so the handshake overlaps weight loading and
compilation instead of serializing in front of the first sampled token.
"""

from __future__ import annotations

import logging
import threading
import time

logger = logging.getLogger(__name__)

_started = False
_done = threading.Event()


def warm_transfer_async() -> None:
    """Start the one-time device->host handshake in the background (idempotent)."""
    global _started
    if _started:
        return
    _started = True

    def _warm() -> None:
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            if jax.devices()[0].platform == "cpu":
                _done.set()
                return
            t0 = time.perf_counter()
            np.asarray(jnp.zeros((1,), jnp.int32))
            dt = time.perf_counter() - t0
            if dt > 1.0:
                logger.info("device->host channel warmed in %.1fs", dt)
        except Exception as e:  # pragma: no cover - best effort
            logger.warning("transfer warmup failed: %s", e)
        finally:
            _done.set()

    threading.Thread(target=_warm, name="d2h-warmup", daemon=True).start()


def wait_warm(timeout: float | None = None) -> bool:
    """Block until the warmup fetch finished (or was never needed)."""
    if not _started:
        return True
    return _done.wait(timeout)

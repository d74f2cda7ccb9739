"""Honest device benchmarking on the axon-tunneled TPU.

``jax.block_until_ready`` does NOT reliably block on this tunnel: pipelined
timings that end in one ``block_until_ready`` have read 0.04 ms for programs
whose true cost is 50-80 ms (round-2 discovery; it also produced round 1's
false "cost volume is 0.2 ms solo" attribution).  The only trustworthy
completion fence is fetching a value (``jax.device_get``).

``bench`` therefore chains dispatches through a scalar data dependency (each
call's input is perturbed by a zero derived from the previous output) and
fetches one scalar at the end — every dispatch must execute, in order, and
the final fetch proves completion of the whole chain.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Sequence


_REDUCERS: dict = {}


def _to_scalar(out: Any) -> Any:
    """Reduce an arbitrary output pytree to one scalar device value.

    One jitted program per tree structure — reducing leaf-by-leaf in
    python dispatches hundreds of tiny ops per call for grad trees and
    dominates the measurement (the bug behind several bogus round-2
    numbers before this was centralized).
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(out)
    arrays = [x for x in leaves if hasattr(x, "dtype")]
    key = (treedef, tuple((a.shape, str(a.dtype)) for a in arrays))
    fn = _REDUCERS.get(key)
    if fn is None:
        @jax.jit
        def fn(xs):
            acc = jnp.float32(0.0)
            for x in xs:
                acc = acc + jnp.asarray(x).ravel()[:1].sum().astype(jnp.float32)
            return acc

        _REDUCERS[key] = fn
    return fn(arrays)


def bench(
    fn: Callable[..., Any],
    args_list: Sequence[tuple],
    n: int = 8,
    warmup: int = 2,
    chain: Callable[[tuple, Any], tuple] | None = None,
) -> float:
    """Seconds per call of ``fn`` (already jitted), honestly fenced.

    ``args_list``: distinct argument tuples, cycled (vary inputs to defeat
    any dispatch-level dedupe).  ``chain(args, carry)`` may inject the carry
    scalar into the next call's args; the default adds ``carry * 0`` to the
    first float array argument.
    """
    import jax
    import jax.numpy as jnp

    def default_chain(args: tuple, carry) -> tuple:
        out = list(args)
        for i, a in enumerate(out):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                out[i] = a + jnp.asarray(carry, a.dtype) * 0
                break
        return tuple(out)

    chain = chain or default_chain

    def run(reps: int) -> float:
        carry = jnp.float32(0.0)
        t0 = time.perf_counter()
        for i in range(reps):
            args = chain(tuple(args_list[i % len(args_list)]), carry)
            carry = _to_scalar(fn(*args))
        float(jax.device_get(carry))  # the only reliable fence
        return (time.perf_counter() - t0) / reps

    run(warmup)
    return run(n)

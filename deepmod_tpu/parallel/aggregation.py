"""On-device per-position aggregation with mesh collectives.

The reference merges per-position (coverage, modcount) through BED files
on disk (myDetect.py:1196-1221, sum_chr_mod.py:47-52). The TPU-native
equivalent: each shard scatter-adds its reads' (position, covered, mod)
triples into dense per-chromosome count vectors with ``segment_sum``-style
``.at[].add`` ops, then a ``psum`` over the 'data' axis merges shards over
ICI. Host code only sees the final merged vectors.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _local_counts(positions, covered, modded, length: int):
    cov = jnp.zeros((length,), jnp.int32).at[positions].add(
        covered.astype(jnp.int32)
    )
    mod = jnp.zeros((length,), jnp.int32).at[positions].add(
        modded.astype(jnp.int32)
    )
    return cov, mod


_REDUCER_CACHE: dict = {}


def _get_reducer(mesh: Mesh, length: int, axis: str):
    """Jitted shard_map reducer, cached per (mesh, length, axis).

    Building a fresh closure per call would defeat jax.jit's cache and
    recompile the hot per-(chr,strand)-per-batch reduction every time
    (especially costly through this environment's remote compile helper).
    """
    key = (mesh, length, axis)
    fn = _REDUCER_CACHE.get(key)
    if fn is None:
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
        )
        def reduce(pos, cov, mod):
            local_cov, local_mod = _local_counts(pos, cov, mod, length)
            return (
                jax.lax.psum(local_cov, axis),
                jax.lax.psum(local_mod, axis),
            )

        fn = jax.jit(reduce)
        _REDUCER_CACHE[key] = fn
    return fn


def sharded_position_counts(
    mesh: Mesh,
    positions,
    covered,
    modded,
    length: int,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard position observations into global count vectors.

    positions/covered/modded: (N,) arrays sharded over `axis` (N divisible
    by the axis size; pad with covered=modded=0 rows at position 0).
    Returns replicated (coverage, mod_count) int32 vectors of `length`.
    """
    return _get_reducer(mesh, length, axis)(
        jnp.asarray(positions), jnp.asarray(covered), jnp.asarray(modded)
    )

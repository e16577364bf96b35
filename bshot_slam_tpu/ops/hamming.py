"""Hamming-distance matching of B-SHOT descriptors (JAX, MXU-first).

The reference's matcher is a serial O(N_src x N_ref) CPU loop of
`popcount(bitset^bitset)` with first-minimum selection and a mutual-nearest-
neighbor filter (reference: src/lidar_odometry.cpp:212-242, minVect at
include/bshot_bits.h:6-20).  On TPU the same mathematics maps onto the MXU:
for 0/1 bit vectors a, b,

    hamming(a, b) = popcount(a) + popcount(b) - 2 a.b

so the full distance matrix is one bf16 matmul over (N, 352) bit matrices
plus rank-1 corrections — exact, because 0/1 inputs are exact in bf16 and
the f32 accumulator bounds every sum by 352.  A popcount/XOR path over the
packed uint32 words is kept as the semantic oracle and for small batches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.ops.bshot import unpack_bits

_BIG = jnp.int32(2**30)


def popcount_distances(a_words: jnp.ndarray, b_words: jnp.ndarray) -> jnp.ndarray:
    """(Na, W) x (Nb, W) packed uint32 -> (Na, Nb) int32 XOR-popcount."""
    x = a_words[:, None, :] ^ b_words[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def matmul_distances(a_bits: jnp.ndarray, b_bits: jnp.ndarray) -> jnp.ndarray:
    """(Na, 352) x (Nb, 352) {0,1} -> (Na, Nb) int32 Hamming via MXU."""
    a = a_bits.astype(jnp.bfloat16)
    b = b_bits.astype(jnp.bfloat16)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    pa = jnp.sum(a_bits.astype(jnp.int32), axis=-1)
    pb = jnp.sum(b_bits.astype(jnp.int32), axis=-1)
    return (pa[:, None] + pb[None, :] - 2.0 * cross).astype(jnp.int32)


class MutualMatches(NamedTuple):
    src_to_ref: jnp.ndarray  # (Na,) best ref index per src
    distances: jnp.ndarray  # (Na,) Hamming distance of that pair
    mutual: jnp.ndarray  # (Na,) True where the pair is a mutual NN


@functools.partial(jax.jit, static_argnames=("use_matmul",))
def mutual_nn(
    a_words: jnp.ndarray,
    a_mask: jnp.ndarray,
    b_words: jnp.ndarray,
    b_mask: jnp.ndarray,
    use_matmul: bool = True,
) -> MutualMatches:
    """Mutual-nearest-neighbor Hamming correspondences
    (reference: src/lidar_odometry.cpp:217-242).

    Invalid rows/columns get +inf distance; ties resolve to the lowest
    index, matching the reference's strict-< minimum scan.
    """
    if use_matmul:
        d = matmul_distances(unpack_bits(a_words), unpack_bits(b_words))
    else:
        d = popcount_distances(a_words, b_words)
    d = jnp.where(a_mask[:, None] & b_mask[None, :], d, _BIG)
    left_nn = jnp.argmin(d, axis=1)  # (Na,)
    right_nn = jnp.argmin(d, axis=0)  # (Nb,)
    mutual = (right_nn[left_nn] == jnp.arange(d.shape[0])) & a_mask
    best = jnp.min(d, axis=1)
    mutual = mutual & (best < _BIG)
    return MutualMatches(src_to_ref=left_nn, distances=best, mutual=mutual)


@functools.partial(jax.jit, static_argnames=("tail_start",))
def mutual_nn_bounded(
    a_words: jnp.ndarray,
    a_mask: jnp.ndarray,
    b_words: jnp.ndarray,
    b_mask: jnp.ndarray,
    n_valid_b: jnp.ndarray,
    tail_start: int = -1,
) -> MutualMatches:
    """`mutual_nn` with an upper bound on valid candidate rows.

    On TPU this runs the Pallas streaming kernel that skips candidate tiles
    past `n_valid_b` (valid candidates must be front-compacted); elsewhere
    it falls back to the dense path.  Results are identical.
    """
    if jax.default_backend() != "tpu":
        return mutual_nn(a_words, a_mask, b_words, b_mask)
    from bshot_slam_tpu.kernels.mapops import hamming_nn_bounded

    a_bits = unpack_bits(a_words).astype(jnp.float32)
    amin, aarg, _, barg = hamming_nn_bounded(
        a_bits, a_mask, b_words, b_mask, n_valid_b, tail_start=tail_start
    )
    mutual = (barg[aarg] == jnp.arange(a_words.shape[0])) & a_mask
    mutual = mutual & (amin < 1e30)
    return MutualMatches(
        src_to_ref=aarg,
        distances=jnp.where(mutual, amin, _BIG).astype(jnp.int32),
        mutual=mutual,
    )

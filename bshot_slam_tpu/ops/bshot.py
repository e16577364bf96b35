"""B-SHOT binarization: SHOT-352 floats -> 352-bit binary descriptors (JAX).

Vectorized rebuild of the reference's per-group 14-case decision tree
(reference: include/bshot_bits.h:144-278).  Each group of 4 consecutive SHOT
floats maps to 4 bits: the first subset S (in the fixed priority order
below) whose sum exceeds 0.9x the group sum has its bits set; an all-zero
group yields 0000 and the fallback is 1111.  The C++ if/else ladder becomes
an argmax over a priority-ordered condition stack — 15 masked compares per
group, fully parallel over (batch, 88) groups on the VPU.

Bit packing: bit i of the descriptor lives in word i//32 at position i%32
(LSB-first), 11 uint32 words per descriptor; Hamming distances are
invariant to this convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bshot_slam_tpu.config import DescriptorConfig

# Subset priority order from the reference ladder (bshot_bits.h:171-260):
# singles, pairs (01,12,23,03,13,02), triples (012,123,023,013), all.
_SUBSETS = (
    (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1),
    (1, 1, 0, 0), (0, 1, 1, 0), (0, 0, 1, 1), (1, 0, 0, 1),
    (0, 1, 0, 1), (1, 0, 1, 0),
    (1, 1, 1, 0), (0, 1, 1, 1), (1, 0, 1, 1), (1, 1, 0, 1),
    (1, 1, 1, 1),
)


@functools.partial(jax.jit, static_argnames=("threshold",))
def binarize(shot: jnp.ndarray, threshold: float = 0.9) -> jnp.ndarray:
    """(..., 352) SHOT floats -> (..., 352) {0,1} uint8 bits."""
    batch = shot.shape[:-1]
    groups = shot.reshape(batch + (88, 4)).astype(jnp.float32)
    total = jnp.sum(groups, axis=-1)
    thr = threshold * total

    subsets = jnp.asarray(_SUBSETS, jnp.float32)  # (15, 4)
    sums = jnp.einsum("...gf,sf->...gs", groups, subsets)  # (..., 88, 15)
    # Fallback (all-ones subset) always fires: sum == total > 0.9*total
    # whenever total > 0; force it explicitly to be robust to total == 0.
    cond = sums > thr[..., None]
    cond = cond.at[..., -1].set(True)
    first = jnp.argmax(cond, axis=-1)  # first true in priority order

    bits = jnp.asarray(_SUBSETS, jnp.uint8)[first]  # (..., 88, 4)
    all_zero = jnp.all(groups == 0, axis=-1)
    bits = jnp.where(all_zero[..., None], jnp.uint8(0), bits)
    return bits.reshape(batch + (352,))


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 352) {0,1} -> (..., 11) uint32, LSB-first within each word."""
    batch = bits.shape[:-1]
    words = bits.reshape(batch + (11, 32)).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts, axis=-1).astype(jnp.uint32)


def unpack_bits(words: jnp.ndarray) -> jnp.ndarray:
    """(..., 11) uint32 -> (..., 352) uint8 bits."""
    batch = words.shape[:-1]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(batch + (352,)).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg",))
def bshot_from_shot(
    shot: jnp.ndarray, cfg: DescriptorConfig
) -> jnp.ndarray:
    """SHOT floats -> packed (..., 11) uint32 B-SHOT descriptors."""
    return pack_bits(binarize(shot, cfg.bshot_threshold))

"""Halo-exchange context parallelism for BANDED (sliding-window) attention.

For full attention, context parallelism needs a ring: every Q shard must see
every K/V shard (``parallel/ring_attention``).  A banded timeline
(|i−j| ≤ window) needs none of that: a shard's band reaches at most
``window`` frames into each NEIGHBOR, so one ``ppermute`` to each side —
riding a single ICI hop, no ring, no log-sum-exp merge — gives every device
the exact keys its band touches.  Per-device cost is O(T_local·W·d) compute
and two W-frame halo transfers per layer, independent of the mesh size.

Formulation: each shard runs the banded kernel with its LOCAL query rows
against the EXTENDED key sequence (left halo ‖ local ‖ right halo) using the
kernel's static q_offset=W band shift — the global band |gi − gj| ≤ W maps
exactly onto |(i + W) − j| ≤ W in extended key coordinates, with zero FLOPs
spent on discarded halo queries.  The result is EXACT — equal to monolithic
banded attention (tested ≤1e-5).
Shards at the global sequence edges have nonexistent halos (the ppermute
wraps around the ring); those keys are masked by dynamic [lo, hi) validity
bounds, which also mask global padding when T doesn't divide the mesh.

The reference has no attention and no distribution at all (SURVEY.md §2.3);
this module exists for the new full-rate spotting capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_attention_local(
    q_l: jax.Array,               # (H, T_local, d) — this device's shard
    k_l: jax.Array,
    v_l: jax.Array,
    axis: str = "data",
    window: int = 256,
    t_valid: int | None = None,   # global true length (masks pad + edge halos)
    use_flash: bool = False,
    flash_interpret: bool = False,
) -> jax.Array:
    """Per-shard banded attention body; call inside an enclosing ``shard_map``.

    Requires ``window ≤ T_local`` (halos come from immediate neighbors only —
    at match scale W≈1k vs T_local≈17k this always holds; shrink the mesh or
    the window otherwise).
    """
    h, tl, d = q_l.shape
    if window > tl:
        raise ValueError(
            f"halo banded attention needs window ({window}) <= per-device "
            f"shard length ({tl}): halos come from immediate neighbors only. "
            f"Use fewer devices on the sequence axis or a smaller window."
        )
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    w = window

    if w == 0:
        ext_k, ext_v = k_l, v_l
    else:
        # one hop to each neighbor; wrap-around halos at the global edges are
        # masked by the [lo, hi) bounds below
        fwd = [(j, (j + 1) % n) for j in range(n)]   # receive prev's tail
        bwd = [((j + 1) % n, j) for j in range(n)]   # receive next's head
        k_left = jax.lax.ppermute(k_l[:, tl - w:], axis_name=axis, perm=fwd)
        v_left = jax.lax.ppermute(v_l[:, tl - w:], axis_name=axis, perm=fwd)
        k_right = jax.lax.ppermute(k_l[:, :w], axis_name=axis, perm=bwd)
        v_right = jax.lax.ppermute(v_l[:, :w], axis_name=axis, perm=bwd)
        ext_k = jnp.concatenate([k_left, k_l, k_right], axis=1)
        ext_v = jnp.concatenate([v_left, v_l, v_right], axis=1)

    # Q stays the LOCAL rows only (no padded halo queries — the kernel's
    # static q_offset=w shifts the band instead, saving 2W rows of work per
    # shard per layer).  Extended key index j ↔ global position me·tl − w + j;
    # valid keys are the global [0, t_valid) mapped into extended coordinates.
    ext_len = tl + 2 * w
    g0 = me * tl - w
    tv = jnp.int32(n * tl if t_valid is None else t_valid)
    lo = jnp.clip(-g0, 0, ext_len)
    hi = jnp.clip(tv - g0, 0, ext_len)

    if use_flash:
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            flash_attention_local_bounded,
        )

        out = flash_attention_local_bounded(
            q_l, ext_k, ext_v, lo.astype(jnp.float32), hi.astype(jnp.float32),
            window, flash_interpret, w,
        )
    else:
        from cvml_goalnet_tpu.ops.pallas.flash_attention import (
            attention_local_bounded_reference,
        )

        out = attention_local_bounded_reference(
            q_l, ext_k, ext_v, lo, hi, window, q_offset=w,
        )
    return out.astype(q_l.dtype)

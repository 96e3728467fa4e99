#!/usr/bin/env python3
"""On-device numerics gate for BOTH pallas attention kernels (VERDICT r4 #2).

Runs on the real TPU and asserts, against the einsum path's exact math:

* fused kernel (ops/fused_attention.py, 128 <= T <= 896): forward outputs and
  (dq, dk, dv) input grads PLUS end-to-end parameter grads through a
  MultiHeadAttention module, bf16 at T=512/896 and f32 at T=512;
* flash kernel (blocks._flash_attention, T >= 1024): forward + input grads at
  T=1024 and T=1280, bf16 — closing the r4 gap where the kernel's numerics
  had only ever been asserted in interpret mode, never on the hardware that
  executes them;
* fused in-kernel dropout semantics (TPU PRNG, no HBM mask traffic):
  - observed keep rate over the full causal region (the dropped weight
    matrix Pd is reconstructed exactly via shifted-identity V probes),
  - surviving weights scale exactly as p/keep vs the deterministic run,
  - forward/backward draw the SAME mask: Pd is independently reconstructed
    from the BACKWARD kernel (grad wrt V with identity cotangents reads out
    dV = Pd^T @ dO rows) and must match the forward reconstruction
    bit-exactly — mask pattern and values; plus a grad-direction finite-
    difference cross-check in true f32;
* microbenchmark: fused vs einsum fwd+bwd wall time at the flagship shape,
  dropout on and off.

Writes docs/attention_numerics_tpu.json (replayed by
tests/unit/test_attention_numerics_replay.py) and exits non-zero if any
tolerance fails — driver-runnable like bench.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# bf16 has ~3 decimal digits; softmax + two matmuls at T<=1280 stay well
# inside 2e-2 relative on honest kernels (measured headroom ~5x).
#
# f32 diagnostics run under jax.default_matmul_precision("highest"): at
# DEFAULT precision the MXU executes f32 matmuls as bf16 multiply passes
# (measured on v5e: kernel-vs-einsum fwd rel err 1.7e-5 at DEFAULT vs
# 1.4e-7 at HIGHEST), so a true-f32 comparison — the point of the f32
# cases, isolating kernel-math bugs from dtype rounding — needs HIGHEST.
# The context manager propagates into pallas dot_generals, so both paths
# are compared at the same (full) precision.  bf16 cases stay at the
# production precision the training step actually uses.
TOL = {"bf16_fwd": 2e-2, "bf16_grad": 3e-2, "f32_fwd": 2e-5, "f32_grad": 1e-4,
       "keep_rate_abs": 0.01, "scale_rel": 1e-3, "fd_rel": 2e-3}


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.max(np.abs(b))), 1e-12)
    return float(np.max(np.abs(a - b)) / denom)


def einsum_reference(q, k, v, scale):
    import jax
    import jax.numpy as jnp

    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    T = q.shape[2]
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None, None], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def compare_paths(kernel_fn, T, dh, dtype, B=4, H=8, seed=0):
    """fwd + (dq, dk, dv) rel errors of kernel_fn vs einsum_reference."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    shape = (B, H, T, dh)
    q, k, v, co = (
        jnp.asarray(rng.normal(size=shape), dtype) for _ in range(4)
    )
    scale = 1.0 / dh**0.5

    out = jax.jit(kernel_fn, static_argnums=3)(q, k, v, scale)
    ref = jax.jit(einsum_reference, static_argnums=3)(q, k, v, scale)
    res = {"fwd": rel_err(out, ref)}

    gk = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(kernel_fn(q, k, v, scale) * co),
                 argnums=(0, 1, 2))
    )(q, k, v)
    gr = jax.jit(
        jax.grad(lambda q, k, v: jnp.sum(einsum_reference(q, k, v, scale) * co),
                 argnums=(0, 1, 2))
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gk, gr):
        res[name] = rel_err(a, b)
    return res


def module_param_grads(T=512):
    """End-to-end parameter grads (w_q/w_k/w_v/w_o kernels) through
    MultiHeadAttention: fused branch vs einsum branch, f32."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.models.blocks import MultiHeadAttention

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, T, 128)), jnp.float32)
    plain = MultiHeadAttention(128, 2, 0.0, use_rope=True, use_flash=False)
    fused = MultiHeadAttention(128, 2, 0.0, use_rope=True, use_flash=True)
    params = plain.init(jax.random.PRNGKey(0), x, causal=True)

    def loss(module):
        def f(p):
            out, _ = module.apply(p, x, causal=True)
            return jnp.sum(out**2)
        return f

    gp = jax.jit(jax.grad(loss(plain)))(params)
    gf = jax.jit(jax.grad(loss(fused)))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = jax.tree_util.tree_leaves(gf)
    worst = {"param": None, "rel": 0.0}
    for (path, a), b in zip(flat_p, flat_f):
        r = rel_err(b, a)
        if r > worst["rel"]:
            worst = {"param": jax.tree_util.keystr(path), "rel": r}
    return worst


def dropout_semantics(T=128, dh=64, rate=0.1, seed=3):
    """Direct observation of the in-kernel dropout.

    The dropped weight matrix Pd is reconstructed twice and compared:

    * FORWARD: V = shifted-identity column blocks, so the kernel output
      reads out Pd[:, j0:j0+dh] directly — T/dh probe calls give the full
      (T, T) matrix the forward actually applied;
    * BACKWARD: grad wrt V with the same shifted-identity cotangent — the
      custom-VJP bwd kernel computes dV = Pd^T @ dO with ITS OWN reseeded
      PRNG mask, so dv[..., k, j] == Pd_bwd[j0+j, k] reads out the rows
      the backward actually used.

    Bit-exact agreement of the two reconstructions (mask pattern AND kept
    values) proves fwd and bwd draw the same mask on the real hardware —
    strictly stronger than a finite-difference probe.  A grad-direction FD
    check is kept as an independent end-to-end cross-check (the r5-initial
    random-direction FD was ill-conditioned: <g, d_random> signal ~2e-2 vs
    f32 cancellation noise in sum(attn^2) ~ 1e3, and at DEFAULT matmul
    precision the eps*d perturbation lands below the MXU's bf16-pass input
    rounding — it measured PRNG noise, not the kernel).

    Small logits (x0.1 inputs) keep softmax near-uniform so no causal entry
    underflows f32 and every position is observable.
    """
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.ops.fused_attention import fused_attention

    rng = np.random.default_rng(seed)
    B, H = 2, 4
    q = jnp.asarray(rng.normal(size=(B, H, T, dh)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, dh)) * 0.1, jnp.float32)
    scale = 1.0 / dh**0.5
    key = jax.random.PRNGKey(41)
    keep = 1.0 - rate

    def eye_block(j0):
        e = np.zeros((T, dh), np.float32)
        e[j0 : j0 + dh] = np.eye(dh, dtype=np.float32)
        return jnp.broadcast_to(jnp.asarray(e), (B, H, T, dh))

    # full fwd Pd (and deterministic P) via identity probes
    pd_cols, p_cols = [], []
    for j0 in range(0, T, dh):
        v = eye_block(j0)
        pd_cols.append(np.asarray(fused_attention(
            q, k, v, scale=scale, dropout_rate=rate, dropout_rng=key)))
        p_cols.append(np.asarray(fused_attention(q, k, v, scale=scale)))
    pd_fwd = np.concatenate(pd_cols, axis=-1)  # (B, H, T, T)
    p_det = np.concatenate(p_cols, axis=-1)
    pd_fwd2 = np.concatenate(
        [np.asarray(fused_attention(q, k, eye_block(j0), scale=scale,
                                    dropout_rate=rate, dropout_rng=key))
         for j0 in range(0, T, dh)], axis=-1)

    # full bwd Pd via grad-wrt-V probes with identity cotangents
    vx = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
    pd_rows = []
    for j0 in range(0, T, dh):
        co = eye_block(j0)
        dv = jax.grad(lambda vv: jnp.sum(fused_attention(
            q, k, vv, scale=scale, dropout_rate=rate, dropout_rng=key) * co))(vx)
        pd_rows.append(np.asarray(dv).transpose(0, 1, 3, 2))
    pd_bwd = np.concatenate(pd_rows, axis=2)  # (B, H, T, T)

    causal = np.broadcast_to(np.tril(np.ones((T, T), bool)), pd_fwd.shape)
    mask_fwd = pd_fwd != 0.0
    mask_bwd = pd_bwd != 0.0
    mask_disagree = int((causal & (mask_fwd != mask_bwd)).sum())
    kept_sel = causal & mask_fwd & mask_bwd
    pd_val_rel = float(np.max(
        np.abs(pd_fwd - pd_bwd)[kept_sel] / np.maximum(np.abs(pd_fwd[kept_sel]), 1e-12)
    )) if kept_sel.any() else 0.0

    keep_hat = float(mask_fwd[causal].mean())
    sel = kept_sel & (p_det > 1e-8)
    scale_err = float(
        np.max(np.abs(pd_fwd[sel] - p_det[sel] / keep) / (p_det[sel] / keep))
    )

    # independent end-to-end check: jax.grad at fixed seed vs central finite
    # differences ALONG THE GRADIENT DIRECTION (maximal signal) in true f32.
    fkey = jax.random.PRNGKey(55)
    qs = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)

    def f(qq):
        return jnp.sum(
            fused_attention(qq, ks, vs, scale=0.125, dropout_rate=rate,
                            dropout_rng=fkey) ** 2
        )

    g = jax.jit(jax.grad(f))(qs)
    gnorm = float(jnp.linalg.norm(g))
    d = g / gnorm
    eps = 1e-2
    fd = (float(f(qs + eps * d)) - float(f(qs - eps * d))) / (2 * eps)
    fd_rel = abs(fd - gnorm) / max(abs(fd), 1e-12)

    return {
        "rate": rate,
        "keep_rate_observed": keep_hat,
        "keep_rate_expected": keep,
        "keep_rate_abs_err": abs(keep_hat - keep),
        "surviving_weight_scale_max_rel_err": scale_err,
        "mask_fwd_bwd_disagreements": mask_disagree,
        "mask_positions_checked": int(causal.sum()),
        "pd_fwd_bwd_max_rel_err": pd_val_rel,
        "grad_fd_rel_err": fd_rel,
        "same_seed_deterministic": bool(np.array_equal(pd_fwd, pd_fwd2)),
    }


def packed_identity(T=512, dh=64, B=4, H=8, rate=0.1, seed=5):
    """The packed (B, T, H*Dh) layout must be BIT-IDENTICAL to the folded
    (B*H, T, Dh) layout under dropout: panel id b*H + h seeds the same
    per-panel PRNG stream, so outputs AND input grads must agree exactly —
    any mismatch means the transpose-free path draws different masks than
    the layout it replaced."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.ops.fused_attention import _fused, _fused_packed

    rng = np.random.default_rng(seed)
    shape = (B, H, T, dh)
    q, k, v, co = (
        jnp.asarray(rng.normal(size=shape), jnp.bfloat16) for _ in range(4)
    )
    scale = 1.0 / dh**0.5
    seed_arr = jnp.asarray([12345], jnp.int32)
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
    fold = lambda x: x.reshape(B * H, T, dh)

    lens = jnp.full((B,), T, jnp.int32)

    def loss_folded(q, k, v):
        out = _fused((scale, rate), seed_arr, fold(q), fold(k), fold(v))
        return jnp.sum(out.astype(jnp.float32) * fold(co).astype(jnp.float32))

    def loss_packed(qp, kp, vp):
        out = _fused_packed((scale, rate, H, True), seed_arr, lens, qp, kp, vp)
        return jnp.sum(out.astype(jnp.float32) * pack(co).astype(jnp.float32))

    out_f = jax.jit(
        lambda q, k, v: _fused((scale, rate), seed_arr, fold(q), fold(k), fold(v))
    )(q, k, v)
    out_p = jax.jit(
        lambda q, k, v: _fused_packed(
            (scale, rate, H, True), seed_arr, lens, pack(q), pack(k), pack(v)
        )
    )(q, k, v)
    out_f_btd = np.asarray(
        out_f.reshape(B, H, T, dh).transpose(0, 2, 1, 3).reshape(B, T, H * dh),
        np.float32,
    )
    fwd_mismatches = int(np.sum(out_f_btd != np.asarray(out_p, np.float32)))

    gf = jax.jit(jax.grad(loss_folded, argnums=(0, 1, 2)))(q, k, v)
    gp = jax.jit(jax.grad(loss_packed, argnums=(0, 1, 2)))(
        pack(q), pack(k), pack(v)
    )
    grad_mismatches = 0
    for a, b in zip(gf, gp):
        a_btd = np.asarray(pack(a), np.float32)
        grad_mismatches += int(np.sum(a_btd != np.asarray(b, np.float32)))
    return {
        "fwd_bit_mismatches": fwd_mismatches,
        "grad_bit_mismatches": grad_mismatches,
        "elements": int(B * T * H * dh),
    }


def xattn_check(T=512, dh=64, B=4, H=8, seed=7):
    """Non-causal packed kernel (cross-attention) vs the einsum path's
    masked semantics, with RAGGED per-row kv lengths (suffix padding):
    fwd + input-grad rel errors over the VALID region."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.ops.fused_attention import fused_attention_packed

    rng = np.random.default_rng(seed)
    shape = (B, H, T, dh)
    q, k, v, co = (
        jnp.asarray(rng.normal(size=shape), jnp.bfloat16) for _ in range(4)
    )
    lens = jnp.asarray(rng.integers(T // 3, T + 1, size=(B,)), jnp.int32)
    scale = 1.0 / dh**0.5
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
    valid_q = np.ones((B, 1, T, 1), bool)  # every query row is meaningful

    def ref(q, k, v):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        keymask = jnp.arange(T)[None, None, None, :] < lens[:, None, None, None]
        logits = jnp.where(keymask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", w, v)

    out_p = jax.jit(
        lambda q, k, v: fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale,
            causal=False, kv_lengths=lens,
        )
    )(q, k, v)
    out_r = jax.jit(ref)(q, k, v)
    res = {"fwd": rel_err(out_p, pack(out_r))}

    def loss_p(q, k, v):
        out = fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale,
            causal=False, kv_lengths=lens,
        )
        return jnp.sum(out.astype(jnp.float32) * pack(co).astype(jnp.float32))

    def loss_r(q, k, v):
        return jnp.sum(
            ref(q, k, v).astype(jnp.float32) * co.astype(jnp.float32)
        )

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
        res[name] = rel_err(a * valid_q, b * valid_q)
    return res


def bench_pair(T=512, dh=64, B=32, H=8, iters=30):
    """Wall time of fused vs einsum, fwd+bwd, dropout off/on, bf16."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.ops.fused_attention import fused_attention

    rng = np.random.default_rng(0)
    shape = (B, H, T, dh)
    q, k, v, co = (
        jnp.asarray(rng.normal(size=shape), jnp.bfloat16) for _ in range(4)
    )
    scale = 1.0 / dh**0.5
    key = jax.random.PRNGKey(9)

    def timed(fn, *args):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        out = g(*args)  # compile
        _ = float(jnp.sum(out[0]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _i in range(iters):
            out = g(*args)
        _ = float(jnp.sum(out[0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / iters * 1e3

    rows = {}
    rows["einsum_ms"] = timed(
        lambda q, k, v: jnp.sum(
            einsum_reference(q, k, v, scale).astype(jnp.float32) * co.astype(jnp.float32)
        ), q, k, v,
    )
    rows["fused_ms"] = timed(
        lambda q, k, v: jnp.sum(
            fused_attention(q, k, v, scale=scale).astype(jnp.float32)
            * co.astype(jnp.float32)
        ), q, k, v,
    )

    # einsum path's dropout cost: bernoulli mask over the (B,H,T,T) weights
    rows["einsum_dropout_ms"] = timed(
        lambda q, k, v: jnp.sum(
            jnp.einsum(
                "bhqk,bhkd->bhqd",
                jnp.where(
                    jax.random.bernoulli(
                        key, 0.9,
                        (q.shape[0], q.shape[1], q.shape[2], k.shape[2]),
                    ),
                    jax.nn.softmax(
                        jnp.where(
                            jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))[
                                None, None
                            ],
                            jnp.einsum(
                                "bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32,
                            ) * scale,
                            -1e9,
                        ),
                        axis=-1,
                    ).astype(q.dtype) / jnp.asarray(0.9, q.dtype),
                    0,
                ),
                v,
            ).astype(jnp.float32) * co.astype(jnp.float32)
        ), q, k, v,
    )
    rows["fused_dropout_ms"] = timed(
        lambda q, k, v: jnp.sum(
            fused_attention(
                q, k, v, scale=scale, dropout_rate=0.1, dropout_rng=key
            ).astype(jnp.float32) * co.astype(jnp.float32)
        ), q, k, v,
    )

    # transpose-free packed layout: operands ARE the packed projections, so
    # this times what the model actually pays (no boundary layout copies)
    from kokoro_tpu.ops.fused_attention import fused_attention_packed

    qp, kp, vp, cop = (
        x.transpose(0, 2, 1, 3).reshape(B, T, H * dh) for x in (q, k, v, co)
    )
    rows["packed_dropout_ms"] = timed(
        lambda q_, k_, v_: jnp.sum(
            fused_attention_packed(
                q_, k_, v_, num_heads=H, scale=scale,
                dropout_rate=0.1, dropout_rng=key,
            ).astype(jnp.float32) * cop.astype(jnp.float32)
        ), qp, kp, vp,
    )
    return {k_: round(v_, 3) for k_, v_ in rows.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "docs/attention_numerics_tpu.json"))
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({"error": f"requires TPU, got {backend}"}))
        return 1

    import jax.numpy as jnp

    from kokoro_tpu.models.blocks import _flash_attention
    from kokoro_tpu.ops.fused_attention import fused_attention

    from kokoro_tpu.ops.fused_attention import fused_attention_packed

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    fused_fn = lambda q, k, v, s: fused_attention(q, k, v, scale=s)
    flash_fn = lambda q, k, v, s: _flash_attention(q, k, v, causal=True, scale=s)

    def packed_fn(q, k, v, s):
        # compare_paths supplies (B, H, T, dh); adapt to the packed layout
        # and back so the einsum reference applies unchanged
        B, H, T, dh = q.shape
        pk = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
        out = fused_attention_packed(
            pk(q), pk(k), pk(v), num_heads=H, scale=s
        )
        return out.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

    cases = {}
    for label, fn, T, dh, dtype in [
        ("fused_T512_bf16", fused_fn, 512, 64, jnp.bfloat16),
        ("fused_T896_bf16", fused_fn, 896, 64, jnp.bfloat16),
        ("packed_T512_bf16", packed_fn, 512, 64, jnp.bfloat16),
        ("packed_T896_bf16", packed_fn, 896, 64, jnp.bfloat16),
        ("flash_T1024_bf16", flash_fn, 1024, 64, jnp.bfloat16),
        ("flash_T1280_bf16", flash_fn, 1280, 64, jnp.bfloat16),
    ]:
        cases[label] = compare_paths(fn, T, dh, dtype)
        log(f"{label}: {cases[label]}")

    # f32 diagnostics under true-f32 matmuls (see TOL comment)
    with jax.default_matmul_precision("highest"):
        cases["fused_T512_f32"] = compare_paths(fused_fn, 512, 64, jnp.float32)
        log(f"fused_T512_f32: {cases['fused_T512_f32']}")
        worst_params = module_param_grads()
        log(f"module param grads (fused vs einsum, f32): {worst_params}")
        drop = dropout_semantics()
        log(f"dropout semantics: {drop}")

    ident = packed_identity()
    log(f"packed layout identity (bit-exact vs folded, dropout on): {ident}")
    xattn = {
        "xattn_T512_bf16": xattn_check(512, 64),
        "xattn_T896_bf16": xattn_check(896, 64, B=2),
    }
    for k_, v_ in xattn.items():
        log(f"{k_} (non-causal, ragged kv_lens): {v_}")
        cases[k_] = v_

    bench = {} if args.skip_bench else {
        "T512_B32_H8_fwdbwd": bench_pair(512, 64),
        "T896_B16_H8_fwdbwd": bench_pair(896, 64, B=16),
    }
    for k_, v_ in bench.items():
        log(f"bench {k_}: {v_}")

    checks = []
    for label, res in cases.items():
        ftol = TOL["f32_fwd"] if "f32" in label else TOL["bf16_fwd"]
        gtol = TOL["f32_grad"] if "f32" in label else TOL["bf16_grad"]
        checks.append((f"{label}.fwd", res["fwd"], ftol))
        for g in ("dq", "dk", "dv"):
            checks.append((f"{label}.{g}", res[g], gtol))
    checks += [
        ("module_param_grads", worst_params["rel"], TOL["f32_grad"]),
        ("dropout.keep_rate", drop["keep_rate_abs_err"], TOL["keep_rate_abs"]),
        ("dropout.scale", drop["surviving_weight_scale_max_rel_err"], TOL["scale_rel"]),
        ("dropout.mask_fwd_bwd", float(drop["mask_fwd_bwd_disagreements"]), 0.0),
        ("dropout.pd_fwd_bwd", drop["pd_fwd_bwd_max_rel_err"], TOL["f32_grad"]),
        ("dropout.grad_fd", drop["grad_fd_rel_err"], TOL["fd_rel"]),
        ("dropout.deterministic", 0.0 if drop["same_seed_deterministic"] else 1.0, 0.5),
        ("packed.fwd_bit_identity", float(ident["fwd_bit_mismatches"]), 0.0),
        ("packed.grad_bit_identity", float(ident["grad_bit_mismatches"]), 0.0),
    ]
    failures = [
        {"check": n, "value": v, "tol": t} for n, v, t in checks if not v <= t
    ]

    payload = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "jax_version": jax.__version__,
        "tolerances": TOL,
        "kernel_vs_einsum": cases,
        "module_param_grads_worst": worst_params,
        "dropout_semantics": drop,
        "packed_layout_identity": ident,
        "bench_ms": bench,
        "n_checks": len(checks),
        "failures": failures,
        "ok": not failures,
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print(json.dumps({"ok": payload["ok"], "n_checks": len(checks),
                      "failures": failures}))
    return 0 if payload["ok"] else 2


if __name__ == "__main__":
    raise SystemExit(main())

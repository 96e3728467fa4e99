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
  - observed keep rate (via a V=identity-columns probe that reads the first
    Dh columns of the dropped weight matrix directly),
  - surviving weights scale exactly as p/keep vs the deterministic run,
  - forward/backward draw the SAME mask: jax.grad at fixed seed matches
    central finite differences in f32 (the backward recomputes the mask by
    reseeding; a seed mismatch would show up as a gross FD error);
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


def dropout_semantics(T=512, dh=128, rate=0.1, seed=3):
    """Direct observation of the in-kernel dropout via a V=I-columns probe."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.ops.fused_attention import fused_attention

    rng = np.random.default_rng(seed)
    B, H = 2, 4
    q = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
    # V = first dh columns of I_T: output[..., i, j] == dropped_weights[i, j]
    v = jnp.broadcast_to(jnp.eye(T, dh, dtype=jnp.float32), (B, H, T, dh))
    scale = 1.0 / dh**0.5

    p_det = np.asarray(fused_attention(q, k, v, scale=scale))
    p_drop = np.asarray(
        fused_attention(q, k, v, scale=scale, dropout_rate=rate,
                        dropout_rng=jax.random.PRNGKey(41))
    )
    # Consider only entries the causal mask allows AND that are numerically
    # observable in the deterministic run (softmax can underflow to 0).
    row = np.arange(T)[:, None]
    col = np.arange(dh)[None, :]
    observable = (col <= row) & (p_det > 1e-8)
    kept = p_drop != 0.0
    keep_hat = float(np.mean(kept[np.broadcast_to(observable, kept.shape)]))

    keep = 1.0 - rate
    sel = kept & np.broadcast_to(observable, kept.shape)
    scale_err = float(
        np.max(np.abs(p_drop[sel] - p_det[sel] / keep) / (p_det[sel] / keep))
    )

    # fwd/bwd same-mask: jax.grad at fixed seed vs central finite differences
    # along a random direction, f32.
    key = jax.random.PRNGKey(55)
    qs = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    ks = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)

    def f(qq):
        return jnp.sum(
            fused_attention(qq, ks, vs, scale=0.125, dropout_rate=rate,
                            dropout_rng=key) ** 2
        )

    g = jax.jit(jax.grad(f))(qs)
    d = jnp.asarray(rng.normal(size=qs.shape), jnp.float32)
    d = d / jnp.linalg.norm(d)
    eps = 1e-2
    fd = (float(f(qs + eps * d)) - float(f(qs - eps * d))) / (2 * eps)
    analytic = float(jnp.vdot(g, d))
    fd_rel = abs(fd - analytic) / max(abs(fd), 1e-12)

    # determinism: same key -> identical output twice
    p_drop2 = np.asarray(
        fused_attention(q, k, v, scale=scale, dropout_rate=rate,
                        dropout_rng=jax.random.PRNGKey(41))
    )
    return {
        "rate": rate,
        "keep_rate_observed": keep_hat,
        "keep_rate_expected": keep,
        "keep_rate_abs_err": abs(keep_hat - keep),
        "surviving_weight_scale_max_rel_err": scale_err,
        "grad_fd_rel_err": fd_rel,
        "same_seed_deterministic": bool(np.array_equal(p_drop, p_drop2)),
    }


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

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    fused_fn = lambda q, k, v, s: fused_attention(q, k, v, scale=s)
    flash_fn = lambda q, k, v, s: _flash_attention(q, k, v, causal=True, scale=s)

    cases = {}
    for label, fn, T, dh, dtype in [
        ("fused_T512_bf16", fused_fn, 512, 64, jnp.bfloat16),
        ("fused_T896_bf16", fused_fn, 896, 64, jnp.bfloat16),
        ("fused_T512_f32", fused_fn, 512, 64, jnp.float32),
        ("flash_T1024_bf16", flash_fn, 1024, 64, jnp.bfloat16),
        ("flash_T1280_bf16", flash_fn, 1280, 64, jnp.bfloat16),
    ]:
        cases[label] = compare_paths(fn, T, dh, dtype)
        log(f"{label}: {cases[label]}")

    worst_params = module_param_grads()
    log(f"module param grads (fused vs einsum, f32): {worst_params}")
    drop = dropout_semantics()
    log(f"dropout semantics: {drop}")

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
        ("dropout.grad_fd", drop["grad_fd_rel_err"], TOL["fd_rel"]),
        ("dropout.deterministic", 0.0 if drop["same_seed_deterministic"] else 1.0, 0.5),
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

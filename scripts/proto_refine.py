"""Numpy prototype: exact-fast MXU candidate-refine (round-5 item 1).

Question: if the MXU Woop pass runs at bf16_3x (3 passes instead of
HIGHEST's 6) but tracks the TOP-2 candidates per ray under a WIDENED
validity test, and the driver then re-tests just those candidates with
exact f32 Moller-Trumbore, does the final (hit-mask, gid, t) match the
float64 oracle? And how many lanes acquire a candidate at all (the
pend-rate inflation the driver shade stage pays)?

This prototypes the numerics only (ml_dtypes.bfloat16 emulation of the
MXU's bf16 multiply / f32 accumulate), full 131072-ray sets, both
primary and diverged-bounce rays — the decision gate before any kernel
work.

Emulated fast pass per chunk (== ops/pallas/woop.py layout):
  R ~ Ah@Xh + Ah@Xl + Al@Xh   (f32 accumulation)
  t = -oW/dW, u = oU + t dU, v = oV + t dV     (f32 epilogue)
  loose valid: |dW| >= DET_GUARD/DET_RELAX and
               u,v in [-TOL, 1+TOL], u+v <= 1+TOL, t >= EPS - TTOL
  track (t1, g1), (t2, g2) by fast t among loose-valid rows.

Exact refine (what the driver will do with one (M,9) row gather):
  f32 Moller-Trumbore (the integrator's own formulas) on g1 and g2;
  winner = min exact-valid t; compare with oracle.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import ml_dtypes
import numpy as np

EPS = 1e-4
INF = np.float32(3.4e38)
BF = ml_dtypes.bfloat16


def pack_woop(v0, e1, e2, chunk=64):
    """Normalized 7-row Woop pack. Rows per triangle:
      0: U_o = s*(Wu . o + bu)   1: V_o   2: W_o (t row, UNNORMALIZED n)
      3: U_d = s*(Wu . d)        4: V_d   5: W_d (== MT det)
      6: S_o = s (bias-only)
    s = 2^-ceil(log2 max|W_u,v rows + biases|) per triangle, so the
    scaled u/v rows are O(1) and the fast-pass absolute error in
    (u_hat, v_hat) is uniform ~ (|o|+R)*2^-17 regardless of triangle
    size — the one-sided validity tests are scale-invariant:
      u_hat >= -tau, v_hat >= -tau, u_hat+v_hat <= S+2 tau."""
    M = v0.shape[0]
    Tp = -(-max(M, 1) // chunk) * chunk
    n = np.cross(e1, e2)
    mat = np.stack([e1, e2, n], axis=-1).astype(np.float64)
    det3 = np.linalg.det(mat)
    ok = np.abs(det3) > 1e-30
    inv = np.linalg.inv(np.where(ok[:, None, None], mat, np.eye(3)[None]))
    inv[:, 2, :] = n
    inv = np.where(ok[:, None, None], inv, 0.0)
    b = -np.einsum("mij,mj->mi", inv, v0.astype(np.float64))
    mag = np.maximum(
        np.abs(inv[:, 0:2, :]).max(axis=(1, 2)),
        np.abs(b[:, 0:2]).max(axis=1),
    )
    s = np.exp2(-np.ceil(np.log2(np.maximum(mag, 1e-30))))
    s = np.where(ok, s, 0.0)
    A = np.zeros((Tp, 7, 8), np.float64)
    A[:M, 0:2, 0:3] = inv[:, 0:2] * s[:, None, None]
    A[:M, 0:2, 3] = b[:, 0:2] * s[:, None]
    A[:M, 2, 0:3] = inv[:, 2]
    A[:M, 2, 3] = b[:, 2]
    A[:M, 3:5, 4:7] = inv[:, 0:2] * s[:, None, None]
    A[:M, 5, 4:7] = inv[:, 2]
    A[:M, 6, 3] = s
    return A.astype(np.float32), Tp  # (Tp, 7, 8)


def bf16_3x_matmul(A, X):
    """A (r, 8) f32, X (8, N) f32 -> f32, emulating 3-pass bf16."""
    Ah = A.astype(BF).astype(np.float32)
    Al = (A - Ah).astype(BF).astype(np.float32)
    Xh = X.astype(BF).astype(np.float32)
    Xl = (X - Xh).astype(BF).astype(np.float32)
    d = lambda a, b: (a @ b).astype(np.float32)
    return d(Ah, Xh) + d(Ah, Xl) + d(Al, Xh)


def fast_topk(A7, o, d, tau_c, ttol, prec="3x", K=2, order="t"):
    """A7 (Tp, 7, 8); o, d (N, 3). Per-lane tau = tau_c * (|o| + R_s)
    * 2^-17. Returns (tk (K, N) fast ordering keys, gk (K, N) gids),
    plus diagnostics dict with per-ray loose-validity of a probe gid.
    order: "t" plain fast t; "pen" = t * (1 + lam/dW^2) grazing
    penalty ordering."""
    Tp = A7.shape[0]
    N = o.shape[0]
    tk = np.full((K, N), INF, np.float32)
    gk = np.full((K, N), -1, np.int64)
    X = np.stack([o[:, 0], o[:, 1], o[:, 2], np.ones(N),
                  d[:, 0], d[:, 1], d[:, 2], np.zeros(N)], 0).astype(np.float32)
    chunk = 64
    guard = np.float32(EPS)
    tau = (tau_c * (np.linalg.norm(o.astype(np.float32), axis=1)
                    + np.float32(fast_topk.R_s))
           * np.float32(2.0 ** -17)).astype(np.float32)
    probe = fast_topk.probe  # (N,) oracle gid or -1
    probe_loosevalid = np.zeros(N, bool)
    probe_rank_beat = np.zeros(N, np.int64)  # how many valid tris
    # with fast key < probe's fast key (its would-be rank)
    probe_key = np.full(N, INF, np.float32)
    for s in range(0, Tp, chunk):
        A = A7[s:s + chunk].reshape(-1, 8).astype(np.float32)  # (7c, 8)
        if prec == "3x":
            R = bf16_3x_matmul(A, X)
        else:
            R = (A.astype(np.float64) @ X.astype(np.float64)).astype(np.float32)
        c = A7[s:s + chunk].shape[0]
        R = R.reshape(c, 7, N)
        oU, oV, oW = R[:, 0], R[:, 1], R[:, 2]
        dU, dV, dW = R[:, 3], R[:, 4], R[:, 5]
        S = R[:, 6]
        ok = np.abs(dW) >= guard
        invw = np.float32(1.0) / np.where(ok, dW, np.float32(1.0))
        t = (-oW * invw).astype(np.float32)
        u = (oU + t * dU).astype(np.float32)
        v = (oV + t * dV).astype(np.float32)
        valid = (ok & (u >= -tau) & (v >= -tau)
                 & (u + v <= S + 2 * tau) & (t >= EPS - ttol))
        if order == "pen":
            lam = np.float32(fast_topk.lam)
            key = (t * (1.0 + lam * invw * invw)).astype(np.float32)
        else:
            key = t
        if order == "strat":
            # strictly-interior stratum: immune to junk (its members
            # pass the exact re-test with overwhelming probability)
            strict = (ok & (u >= tau) & (v >= tau)
                      & (u + v <= S - 2 * tau) & (t >= EPS + ttol))
            tm = np.where(strict, key, INF)
        else:
            tm = np.where(valid, key, INF)
        # diagnostics for the probe gid
        inrange = (probe >= s) & (probe < s + c)
        pr = np.clip(probe - s, 0, c - 1)
        ar = np.arange(N)
        probe_loosevalid |= inrange & valid[pr, ar]
        probe_key = np.where(inrange & valid[pr, ar], tm[pr, ar], probe_key)
        # merge chunk's K smallest into running top-K
        part = np.argpartition(tm, min(K, c - 1), axis=0)[:K]
        tc = np.take_along_axis(tm, part, 0)
        gc = np.where(tc < INF, part + s, -1)
        allt = np.concatenate([tk, tc], 0)
        allg = np.concatenate([gk, gc], 0)
        sel = np.argsort(allt, axis=0, kind="stable")[:K]
        tk = np.take_along_axis(allt, sel, 0)
        gk = np.take_along_axis(allg, sel, 0)
    probe_rank_beat = (tk < probe_key[None]).sum(0)
    return tk, gk, dict(loosevalid=probe_loosevalid, rank=probe_rank_beat)


def mt_exact_f32(v0, e1, e2, o, d, gids):
    """f32 Moller-Trumbore of ray i against triangle gids[i] (-1 ->
    invalid). Returns (valid, t)."""
    g = np.clip(gids, 0, v0.shape[0] - 1)
    a, b, c = (x[g].astype(np.float32) for x in (v0, e1, e2))
    o = o.astype(np.float32)
    d = d.astype(np.float32)
    pv = np.cross(d, c)
    det = np.einsum("nk,nk->n", a if False else b, pv)  # e1 . pv
    ok = np.abs(det) >= EPS
    inv = np.where(ok, np.float32(1.0) / np.where(ok, det, 1.0), 0.0).astype(np.float32)
    h = (o - a).astype(np.float32)
    u = inv * np.einsum("nk,nk->n", h, pv).astype(np.float32)
    q = np.cross(h, b)
    v = inv * np.einsum("nk,nk->n", d, q).astype(np.float32)
    t = inv * np.einsum("nk,nk->n", c, q).astype(np.float32)
    valid = (gids >= 0) & ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= EPS)
    return valid, np.where(valid, t, INF)


def mt_oracle(v0, e1, e2, o, d):
    best_t = np.full(o.shape[0], np.inf)
    best_i = np.full(o.shape[0], -1, np.int64)
    B = 4096
    for s in range(0, o.shape[0], B):
        oo, dd = o[s:s + B, None, :], d[s:s + B, None, :]
        pv = np.cross(dd, e2[None])
        det = np.einsum("mk,rmk->rm", e1, pv)
        ok = np.abs(det) >= EPS
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        h = oo - v0[None]
        u = inv * np.einsum("rmk,rmk->rm", h, pv)
        q = np.cross(h, e1[None])
        v = inv * np.einsum("rmk,rmk->rm", np.broadcast_to(dd, q.shape), q)
        t = inv * np.einsum("mk,rmk->rm", e2, q)
        ok = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t >= EPS)
        t = np.where(ok, t, np.inf)
        i = np.argmin(t, 1)
        tm = t[np.arange(t.shape[0]), i]
        best_t[s:s + B] = tm
        best_i[s:s + B] = np.where(np.isfinite(tm), i, -1)
    return best_t, best_i


def main():
    from raytrace_tpu.models.config import load_scheme
    from raytrace_tpu.models.scene import build_scene
    from raytrace_tpu.models.camera import build_camera

    scheme_path = os.environ.get(
        "SCHEME", "/root/reference/schemes/spaceship_r1.yml")
    scheme = load_scheme(scheme_path)
    W, H = scheme.render_info.width, scheme.render_info.height
    sc = build_scene(scheme)
    M = sc.n_mesh_tris
    v0 = np.asarray(sc.mt_v0[:M], np.float64)
    e1 = np.asarray(sc.mt_e1[:M], np.float64)
    e2 = np.asarray(sc.mt_e2[:M], np.float64)
    A6, Tp = pack_woop(v0, e1, e2)
    print(f"{os.path.basename(scheme_path)}: {M} tris (Tp {Tp})", flush=True)

    pool = int(os.environ.get("POOL", 1 << 16))
    rng = np.random.default_rng(0)
    cam = build_camera(scheme.cam, W, H)
    pix = rng.integers(0, W * H, pool)
    xs, ys = (pix % W).astype(np.float64), (pix // W).astype(np.float64)
    sx = cam.x_cf * (xs - cam.x_off)
    sy = cam.y_cf * (ys - cam.y_off)
    d = cam.d[None] + cam.right[None] * sx[:, None] + cam.up[None] * sy[:, None]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(cam.o, d.shape).copy()

    ti = rng.integers(0, M, pool)
    uu, vv = rng.uniform(0, 1, (2, pool))
    flip = uu + vv > 1
    uu, vv = np.where(flip, 1 - uu, uu), np.where(flip, 1 - vv, vv)
    ob = v0[ti] + uu[:, None] * e1[ti] + vv[:, None] * e2[ti]
    db = rng.normal(size=(pool, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    ob += db * 1e-3

    tau_c = float(os.environ.get("TAU_C", "8.0"))
    ttol = float(os.environ.get("TTOL", "1e-3"))
    Ks = [int(k) for k in os.environ.get("KS", "2,4").split(",")]
    orders = os.environ.get("ORDERS", "t,pen").split(",")
    fast_topk.lam = float(os.environ.get("LAM", "1e-8"))
    verts = np.concatenate([v0, v0 + e1, v0 + e2], 0)
    fast_topk.R_s = float(np.linalg.norm(verts, axis=1).max())
    print(f"tau_c={tau_c} ttol={ttol} R_s={fast_topk.R_s:.2f} "
          f"lam={fast_topk.lam}")

    for name, (ro, rd) in (("primary", (o, d)), ("bounce", (ob, db))):
        ref_t, ref_i = mt_oracle(v0, e1, e2, ro, rd)
        fast_topk.probe = ref_i
        for order in orders:
            for K in Ks:
                if order == "strat":
                    # K//2 loose-valid + K//2 strictly-interior slots
                    tk1, gk1, diag = fast_topk(
                        A6, ro.astype(np.float32), rd.astype(np.float32),
                        np.float32(tau_c), np.float32(ttol), K=K // 2,
                        order="t")
                    tk2, gk2, _ = fast_topk(
                        A6, ro.astype(np.float32), rd.astype(np.float32),
                        np.float32(tau_c), np.float32(ttol), K=K - K // 2,
                        order="strat")
                    tk = np.concatenate([tk1, tk2], 0)
                    gk = np.concatenate([gk1, gk2], 0)
                else:
                    tk, gk, diag = fast_topk(
                        A6, ro.astype(np.float32), rd.astype(np.float32),
                        np.float32(tau_c), np.float32(ttol), K=K, order=order)
                # driver-exact refine of all K candidates
                tw = np.full(ro.shape[0], INF, np.float32)
                gw = np.full(ro.shape[0], -1, np.int64)
                for k in range(K):
                    valk, tek = mt_exact_f32(v0, e1, e2, ro, rd, gk[k])
                    better = valk & (tek < tw)
                    tw = np.where(better, tek, tw)
                    gw = np.where(better, gk[k], gw)

                hit_ref = ref_i >= 0
                hit_us = gw >= 0
                both = hit_ref & hit_us
                gid_mism = int((ref_i[both] != gw[both]).sum())
                terr = np.abs(tw[both] - ref_t[both]) / np.maximum(ref_t[both], 1e-6)
                bad_gid = int(((ref_i[both] != gw[both]) & (terr > 1e-3)).sum())
                fneg = hit_ref & ~hit_us
                fpos = ~hit_ref & hit_us
                # fneg causes: winner not loose-valid (tolerance) vs
                # displaced (valid but rank >= K)
                rej = fneg & ~diag["loosevalid"]
                disp = fneg & diag["loosevalid"]
                print(f"[{name}] order={order} K={K}: "
                      f"cand-rate {float((gk[0] >= 0).mean()):.3f} "
                      f"(oracle {float(hit_ref.mean()):.3f}) "
                      f"fneg {int(fneg.sum())} (rej {int(rej.sum())} "
                      f"disp {int(disp.sum())}) fpos {int(fpos.sum())} "
                      f"gid-mism {gid_mism} (t-differs {bad_gid}) "
                      f"rel-t max {terr.max() if both.any() else 0:.2e}",
                      flush=True)
                if disp.any():
                    ranks = diag["rank"][disp]
                    print(f"   displaced winner ranks: "
                          f"{np.percentile(ranks, [50, 90, 99, 100])}")


if __name__ == "__main__":
    main()

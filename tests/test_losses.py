"""Golden tests: every objective vs an independent NumPy oracle.

Each oracle re-derives the reference math (cited in ssv_tpu/objectives/
losses.py docstrings) directly in NumPy, following the written definitions —
positives/negatives assembly for NT-Xent, torch's unbiased std for Barlow,
torch F.kl_div semantics for ReLIC, the exact Sinkhorn iteration for SwAV.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssv_tpu.objectives import (
    nt_xent, moco_nce, byol_mse, simsiam_neg_cosine, dino_loss, pirl_nce,
    barlow_twins, relic_loss, swav_loss, sinkhorn_codes, sela_self_label,
)

rs = np.random.RandomState(0)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _log_softmax(x, axis=-1):
    return x - x.max(axis=axis, keepdims=True) - np.log(
        np.exp(x - x.max(axis=axis, keepdims=True)).sum(axis=axis, keepdims=True))


def _ce_rows(logits, label_col=0):
    """Mean cross entropy where every row's true class is `label_col`."""
    lp = _log_softmax(logits, axis=1)
    return -lp[:, label_col].mean()


def nt_xent_oracle(zi, zj, temp, normalize):
    if normalize:
        zi, zj = _norm(zi), _norm(zj)
    n = zi.shape[0]
    rows = []
    z = np.concatenate([zi, zj], 0)
    sim = z @ z.T / temp
    for a in range(2 * n):
        partner = a + n if a < n else a - n
        pos = sim[a, partner]
        negs = [sim[a, k] for k in range(2 * n) if k != a and k != partner]
        rows.append([pos] + negs)
    return _ce_rows(np.array(rows))


def test_nt_xent():
    zi, zj = rs.randn(8, 16), rs.randn(8, 16)
    for normalize, temp in [(True, 0.5), (False, 1.0)]:
        got = float(nt_xent(jnp.array(zi), jnp.array(zj), temperature=temp,
                            normalize=normalize))
        # NOTE the oracle's negatives exclude the positive from the negative
        # set but keep it in the softmax denominator via column 0 — exactly
        # the reference's [pos | negs] construction.
        want = nt_xent_oracle(zi, zj, temp, normalize)
        assert got == pytest.approx(want, rel=1e-5)


def test_moco():
    q, k = rs.randn(6, 8), rs.randn(6, 8)
    queue = _norm(rs.randn(20, 8))
    qn, kn = _norm(q), _norm(k)
    pos = np.sum(qn * kn, 1, keepdims=True) / 0.07
    neg = qn @ queue.T / 0.07
    want = _ce_rows(np.concatenate([pos, neg], 1))
    got = float(moco_nce(jnp.array(q), jnp.array(k), jnp.array(queue),
                         temperature=0.07, normalize=True))
    assert got == pytest.approx(want, rel=1e-5)


def test_byol_mse():
    o1, o2 = _norm(rs.randn(5, 12)), _norm(rs.randn(5, 12))
    t1, t2 = _norm(rs.randn(5, 12)), _norm(rs.randn(5, 12))
    want = np.mean((o1 - t2) ** 2) + np.mean((o2 - t1) ** 2)
    got = float(byol_mse(*map(jnp.array, (o1, o2, t1, t2))))
    assert got == pytest.approx(want, rel=1e-5)


def test_simsiam():
    o, t = _norm(rs.randn(5, 12)), _norm(rs.randn(5, 12))
    want = -np.mean(np.sum(o * t, 1))
    got = float(simsiam_neg_cosine(jnp.array(o), jnp.array(t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_dino():
    bs, vg, vl, K = 3, 2, 6, 10
    teacher = rs.randn(bs, vg, K)
    student = rs.randn(bs, vg + vl, K)
    center = rs.randn(1, K)
    ts, tt = 0.1, 0.05
    logp_s = _log_softmax(student / ts, axis=-1)
    want = 0.0
    for t in range(vg):
        pt = _softmax((teacher[:, t:t + 1, :] - center[None]) / tt, axis=-1)
        want += -np.mean(np.sum(pt * logp_s, -1))
    got = float(dino_loss(jnp.array(teacher), jnp.array(student), ts, tt,
                          jnp.array(center)))
    assert got == pytest.approx(want, rel=1e-5)


def test_pirl():
    bs, d, K = 4, 8, 15
    vi, vp = rs.randn(bs, d), rs.randn(bs, d)
    mpos, mneg = _norm(rs.randn(bs, d)), _norm(rs.randn(K, d))
    vin, vpn = _norm(vi), _norm(vp)
    temp, w = 0.07, 0.5
    pos1 = np.sum(mpos * vpn, 1, keepdims=True) / temp
    pos2 = np.sum(mpos * vin, 1, keepdims=True) / temp
    neg = mpos @ mneg.T / temp
    want = w * _ce_rows(np.concatenate([pos1, neg], 1)) + \
        (1 - w) * _ce_rows(np.concatenate([pos2, neg], 1))
    got = float(pirl_nce(jnp.array(vi), jnp.array(vp), jnp.array(mpos),
                         jnp.array(mneg), temperature=temp, loss_weight=w))
    assert got == pytest.approx(want, rel=1e-5)


def test_pirl_corrected_negatives_carry_gradient():
    """The reference quirk (negatives_from="memory") computes negative
    logits from constants, so the repulsion gradient is exactly zero and
    only attraction trains -> collapse. The corrected mode ("features")
    must (a) match the NumPy NCE oracle and (b) have a loss gradient that
    RESPONDS to the negatives."""
    r = np.random.RandomState(7)  # own stream: don't shift the shared `rs`
    bs, d, K = 4, 8, 15
    vi, vp = r.randn(bs, d), r.randn(bs, d)
    mpos, mneg = _norm(r.randn(bs, d)), _norm(r.randn(K, d))
    vin, vpn = _norm(vi), _norm(vp)
    temp, w = 0.07, 0.5
    pos1 = np.sum(mpos * vpn, 1, keepdims=True) / temp
    pos2 = np.sum(mpos * vin, 1, keepdims=True) / temp
    want = w * _ce_rows(np.concatenate([pos1, vpn @ mneg.T / temp], 1)) + \
        (1 - w) * _ce_rows(np.concatenate([pos2, vin @ mneg.T / temp], 1))
    got = float(pirl_nce(jnp.array(vi), jnp.array(vp), jnp.array(mpos),
                         jnp.array(mneg), temperature=temp, loss_weight=w,
                         negatives_from="features"))
    assert got == pytest.approx(want, rel=1e-5)

    def grad_wrt_img(mode):
        g = jax.grad(lambda v: pirl_nce(v, jnp.array(vp), jnp.array(mpos),
                                        jnp.array(mneg), temperature=temp,
                                        loss_weight=w, negatives_from=mode))
        return np.asarray(g(jnp.array(vi)))

    def max_component_outside_span(grad):
        """Largest per-sample gradient component orthogonal to
        span{m_pos_b, v_img_b} — the only directions the attraction term
        (plus the l2-normalize Jacobian) can produce."""
        worst = 0.0
        for b in range(bs):
            basis = np.linalg.qr(np.stack([mpos[b], vin[b]], 1))[0]
            resid = grad[b] - basis @ (basis.T @ grad[b])
            worst = max(worst, float(np.abs(resid).max()))
        return worst

    # quirk mode: zero repulsion — gradient never leaves the positive span
    assert max_component_outside_span(grad_wrt_img("memory")) < 1e-7
    # corrected mode: the negatives push back through the features
    assert max_component_outside_span(grad_wrt_img("features")) > 1e-3


def test_barlow():
    bs, d = 16, 12
    zi, zj = rs.randn(bs, d), rs.randn(bs, d)
    lam = 0.005
    for normalize in (False, True):
        a, b = (_norm(zi), _norm(zj)) if normalize else (zi, zj)
        a = (a - a.mean(0)) / a.std(0, ddof=1)   # torch std is unbiased
        b = (b - b.mean(0)) / b.std(0, ddof=1)
        corr = a.T @ b / bs
        sq = (corr - np.eye(d)) ** 2
        w = np.full((d, d), lam)
        np.fill_diagonal(w, 1.0)
        want = np.sum(sq * w)
        got = float(barlow_twins(jnp.array(zi), jnp.array(zj),
                                 off_diagonal_weight=lam, normalize=normalize))
        assert got == pytest.approx(want, rel=1e-4)


def test_relic_reference_and_corrected():
    bs, d = 6, 10
    zi, zj, zo = rs.randn(bs, d), rs.randn(bs, d), rs.randn(bs, d)
    temp, alpha = 0.5, 0.5
    zin, zjn, zon = _norm(zi), _norm(zj), _norm(zo)
    contrastive = nt_xent_oracle(zin, zjn, temp, False)
    sim_io = np.sum(zin * zon, 1) / temp
    sim_jo = np.sum(zjn * zon, 1) / temp
    p_i = _softmax(sim_io)
    log_pj = _log_softmax(sim_jo)
    # torch F.kl_div(input, target, log_target=True, reduction=sum)
    #   = sum(exp(target) * (target - input)); reference passes probs as input
    want_ref = contrastive + alpha * np.sum(np.exp(log_pj) * (log_pj - p_i))
    log_pi = _log_softmax(sim_io)
    want_fix = contrastive + alpha * np.sum(np.exp(log_pj) * (log_pj - log_pi))

    got_ref = float(relic_loss(jnp.array(zi), jnp.array(zj), jnp.array(zo),
                               temperature=temp, alpha=alpha))
    got_fix = float(relic_loss(jnp.array(zi), jnp.array(zj), jnp.array(zo),
                               temperature=temp, alpha=alpha, corrected=True))
    assert got_ref == pytest.approx(want_ref, rel=1e-4)
    assert got_fix == pytest.approx(want_fix, rel=1e-4)


def sinkhorn_oracle(scores, eps, iters):
    Q = np.exp(scores / eps).T
    Q = Q / Q.sum()
    K, B = Q.shape
    r, c = np.ones(K) / K, np.ones(B) / B
    for _ in range(iters):
        u = Q.sum(1)
        Q = Q * (r / u)[:, None]
        Q = Q * (c / Q.sum(0))[None, :]
    return (Q / Q.sum(0, keepdims=True)).T


def test_sinkhorn_and_swav():
    bs, K, d = 8, 12, 6
    z1, z2 = _norm(rs.randn(bs, d)), _norm(rs.randn(bs, d))
    protos = _norm(rs.randn(K, d))
    eps, iters, temp = 0.05, 3, 0.1

    s1 = z1 @ protos.T
    q = sinkhorn_oracle(s1, eps, iters)
    got_q = np.asarray(sinkhorn_codes(jnp.array(s1), eps, iters))
    np.testing.assert_allclose(got_q, q, rtol=1e-4, atol=1e-6)
    # each row is a distribution over prototypes
    np.testing.assert_allclose(got_q.sum(1), np.ones(bs), rtol=1e-4)

    s2 = z2 @ protos.T
    q1, q2 = sinkhorn_oracle(s1, eps, iters), sinkhorn_oracle(s2, eps, iters)
    p1, p2 = _log_softmax(s1 / temp, 1), _log_softmax(s2 / temp, 1)
    want = -0.5 * np.mean(np.sum(q1 * p2, 1) + np.sum(q2 * p1, 1))
    got = float(swav_loss(jnp.array(z1), jnp.array(z2), jnp.array(protos),
                          temperature=temp, sinkhorn_eps=eps,
                          sinkhorn_iters=iters))
    assert got == pytest.approx(want, rel=1e-4)


def test_sinkhorn_large_logits_no_overflow():
    """Regression: exp(s/eps) overflowed f32 for SeLA-sharp eps (1/25) on
    real head logits, NaN-ing the plan and collapsing every argmax
    pseudo-label to 0 (measured on the chip — shapes100 SeLA run). The
    log-domain iteration must match a float64 linear-domain oracle and
    yield balanced labels."""
    local_rs = np.random.RandomState(7)  # own stream: shared `rs` order matters
    s = local_rs.randn(64, 16) * 5.0     # |s|/eps up to ~400: f32 exp dies
    eps, iters = 0.04, 3
    got = np.asarray(sinkhorn_codes(jnp.array(s, dtype=jnp.float32), eps, iters))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got.sum(1), np.ones(64), rtol=1e-3)
    want = sinkhorn_oracle(s.astype(np.float64), eps, iters)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-6)
    labels = got.argmax(1)
    counts = np.bincount(labels, minlength=16).astype(np.float64)
    p = counts[counts > 0] / counts.sum()
    assert -(p * np.log(p)).sum() >= 0.5 * np.log(16), counts


def test_swav_with_bank():
    bs, K, d, nb = 4, 6, 5, 7
    z1, z2 = _norm(rs.randn(bs, d)), _norm(rs.randn(bs, d))
    bank = _norm(rs.randn(nb, d))
    protos = _norm(rs.randn(K, d))
    z1c, z2c = np.concatenate([z1, bank]), np.concatenate([z2, bank])
    s1, s2 = z1c @ protos.T, z2c @ protos.T
    q1, q2 = sinkhorn_oracle(s1, 0.05, 3), sinkhorn_oracle(s2, 0.05, 3)
    p1, p2 = _log_softmax(s1 / 0.1, 1), _log_softmax(s2 / 0.1, 1)
    want = -0.5 * np.mean(np.sum(q1 * p2, 1) + np.sum(q2 * p1, 1))
    got = float(swav_loss(jnp.array(z1), jnp.array(z2), jnp.array(protos),
                          bank_features=jnp.array(bank)))
    assert got == pytest.approx(want, rel=1e-4)


def test_sela_self_label():
    B, K = 10, 7
    logits = rs.randn(B, K)
    alpha = rs.randn(K, 1)
    beta = rs.randn(B, 1)
    lam, iters = 25.0, 5

    P = _log_softmax(logits, 1).T ** lam
    a, b = alpha.copy(), beta.copy()
    for _ in range(iters):
        a = 1.0 / (P @ b)
        b = 1.0 / (a.T @ P).T
    want = ((a * P * b.T).T).argmax(-1)

    pseudo, a2, b2 = sela_self_label(jnp.array(logits), jnp.array(alpha),
                                     jnp.array(beta), lmbda=lam, n_iters=iters)
    np.testing.assert_array_equal(np.asarray(pseudo), want)
    np.testing.assert_allclose(np.asarray(a2), a, rtol=1e-4)

"""SSL objectives as pure JAX functions.

Each function reproduces the *semantics* of the corresponding loss in the
reference's utils/losses.py (cited per function), re-derived for XLA:
boolean-mask indexing (losses.py:32-44) becomes static -inf masking so every
shape is compile-time constant, and all similarity blocks are single fused
matmuls on the MXU.

Where the reference computes something widely agreed to be a bug (e.g.
ReLIC's probs-instead-of-log-probs KL input, losses.py:196-201), the faithful
behavior is the default — those semantics shaped the published baseline
numbers — and a `corrected=True` switch gives the textbook version. Each
such spot is documented inline.

Every function here has a NumPy golden test in tests/test_losses.py deriving
the expected value independently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def softmax_cross_entropy(logits, labels):
    """Mean CE with integer labels (torch F.cross_entropy semantics)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


# ---------------------------------------------------------------------------
# SimCLR — NT-Xent (reference losses.py:8-46)
# ---------------------------------------------------------------------------

def nt_xent(zi, zj, temperature: float = 1.0, normalize: bool = False):
    """For anchor a in the 2N concatenated views, positive = the other view
    of the same example; negatives = all other 2N-2 views. The reference
    assembles [pos | negs] rows with boolean masks (losses.py:27-45); the
    masked-logsumexp over the full 2N x 2N similarity matrix below is
    mathematically identical and one MXU matmul."""
    if normalize:
        zi, zj = l2_normalize(zi), l2_normalize(zj)
    n = zi.shape[0]
    z = jnp.concatenate([zi, zj], axis=0)                     # (2N, D)
    sim = jnp.dot(z, z.T, preferred_element_type=jnp.float32) / temperature
    diag = jnp.eye(2 * n, dtype=bool)
    sim = jnp.where(diag, NEG_INF, sim)
    pos_idx = jnp.concatenate([jnp.arange(n) + n, jnp.arange(n)])  # partner view
    pos = jnp.take_along_axis(sim, pos_idx[:, None], axis=1)[:, 0]
    denom = jax.nn.logsumexp(sim, axis=1)
    return jnp.mean(denom - pos)


# ---------------------------------------------------------------------------
# MoCo — InfoNCE against a queue (reference losses.py:49-72)
# ---------------------------------------------------------------------------

def moco_nce(query, keys, queue, temperature: float = 1.0, normalize: bool = True):
    """positives = diag(q k^T); negatives = q @ queue^T; CE with label 0.
    NOTE (parity): the reference normalizes q and k but uses the queue rows
    as stored (rows are normalized on insert, moco.py:31-36)."""
    if normalize:
        query, keys = l2_normalize(query), l2_normalize(keys)
    pos = jnp.sum(query * keys, axis=-1, keepdims=True) / temperature       # (N, 1)
    neg = jnp.dot(query, queue.T, preferred_element_type=jnp.float32) / temperature
    logits = jnp.concatenate([pos, neg], axis=1)
    labels = jnp.zeros((query.shape[0],), jnp.int32)
    return softmax_cross_entropy(logits, labels)


# ---------------------------------------------------------------------------
# BYOL — symmetric MSE on normalized embeddings (byol.py:89,126-130)
# ---------------------------------------------------------------------------

def byol_mse(online_1, online_2, target_1, target_2):
    """Inputs are already L2-normalized by the network heads. MSE over all
    elements (torch nn.MSELoss default), symmetric across the two views:
    ||o1 - t2||^2/(N*D) + ||o2 - t1||^2/(N*D)."""
    l1 = jnp.mean((online_1 - jax.lax.stop_gradient(target_2)) ** 2)
    l2 = jnp.mean((online_2 - jax.lax.stop_gradient(target_1)) ** 2)
    return l1 + l2


# ---------------------------------------------------------------------------
# SimSiam — negative cosine (losses.py:145-151)
# ---------------------------------------------------------------------------

def simsiam_neg_cosine(online, target):
    """-(o . t).sum(1).mean(); both inputs pre-normalized by their heads.
    stop_gradient on the target implements the paper's stop-grad (the
    reference instead uses a permanently frozen twin — see algorithms/simsiam)."""
    return -jnp.mean(jnp.sum(online * jax.lax.stop_gradient(target), axis=1))


# ---------------------------------------------------------------------------
# DINO — centered/sharpened cross-entropy (losses.py:75-89)
# ---------------------------------------------------------------------------

def dino_loss(teacher_views, student_views, temp_s, temp_t, center):
    """teacher_views: (B, Vg, K) global-view teacher outputs;
    student_views: (B, Vg+Vl, K) all student outputs.
    Loss sums, over both teacher globals t, the CE between
    softmax((teacher_t - center)/temp_t) and log_softmax(student/temp_s),
    averaged over batch and *all* student views — including the student view
    of the same crop, exactly like the reference."""
    teacher_views = jax.lax.stop_gradient(teacher_views)
    logp_s = jax.nn.log_softmax(student_views / temp_s, axis=-1)  # (B, V, K)
    total = 0.0
    for t in range(teacher_views.shape[1]):
        probs_t = jax.nn.softmax((teacher_views[:, t, :] - center) / temp_t, axis=-1)
        total = total - jnp.mean(jnp.sum(probs_t[:, None, :] * logp_s, axis=-1))
    return total


# ---------------------------------------------------------------------------
# PIRL — two-term NCE against a per-sample memory bank (losses.py:92-117)
# ---------------------------------------------------------------------------

def pirl_nce(img_features, patch_features, memory_pos, memory_neg,
             temperature: float = 1.0, loss_weight: float = 0.5,
             normalize: bool = True, negatives_from: str = "memory"):
    """negatives_from="memory" preserves the reference quirk: the negative
    logits compare the *memory* positives with the sampled negatives —
    mm(m_pos, m_neg^T) — not the current features with the negatives
    (losses.py:108), and both NCE terms share that negative block. Since
    memory rows are constants w.r.t. the parameters, the quirk removes ALL
    repulsion gradient — only the positive (attraction) term trains, the
    encoder collapses, and the loss settles at chance log(K+1) (measured:
    a 50-epoch run decays to loss 6.908 = log(1001), VALIDATION.md). PIRL
    is absent from the reference's own README table.

    negatives_from="features" is the corrected NCE (the PIRL paper's eq. 4/5:
    each term scores its OWN feature against the negatives), the algorithm's
    default via train/algorithms/pirl.py."""
    if negatives_from not in ("features", "memory"):
        raise ValueError(
            f"negatives_from must be 'features' or 'memory', got {negatives_from!r}")
    if normalize:
        v_img = l2_normalize(img_features)
        v_patch = l2_normalize(patch_features)
    else:
        v_img, v_patch = img_features, patch_features
    bs = v_img.shape[0]
    pos1 = jnp.sum(memory_pos * v_patch, axis=-1, keepdims=True) / temperature
    pos2 = jnp.sum(memory_pos * v_img, axis=-1, keepdims=True) / temperature
    if negatives_from == "features":
        neg1 = jnp.dot(v_patch, memory_neg.T,
                       preferred_element_type=jnp.float32) / temperature
        neg2 = jnp.dot(v_img, memory_neg.T,
                       preferred_element_type=jnp.float32) / temperature
    else:
        neg1 = neg2 = jnp.dot(memory_pos, memory_neg.T,
                              preferred_element_type=jnp.float32) / temperature
    labels = jnp.zeros((bs,), jnp.int32)
    loss1 = softmax_cross_entropy(jnp.concatenate([pos1, neg1], axis=1), labels)
    loss2 = softmax_cross_entropy(jnp.concatenate([pos2, neg2], axis=1), labels)
    return loss_weight * loss1 + (1.0 - loss_weight) * loss2


# ---------------------------------------------------------------------------
# Barlow Twins — cross-correlation to identity (losses.py:120-142)
# ---------------------------------------------------------------------------

def barlow_twins(zi, zj, off_diagonal_weight: float = 0.005, normalize: bool = True):
    """Standardize each embedding dim over the batch (torch .std is the
    unbiased/ddof=1 estimator — matched here), cross-correlate, and penalize
    (C - I)^2 with off-diagonal weight lambda. Sum-reduced."""
    if normalize:
        zi, zj = l2_normalize(zi), l2_normalize(zj)
    bs, d = zi.shape
    zi = (zi - jnp.mean(zi, axis=0)) / jnp.std(zi, axis=0, ddof=1)
    zj = (zj - jnp.mean(zj, axis=0)) / jnp.std(zj, axis=0, ddof=1)
    corr = jnp.dot(zi.T, zj, preferred_element_type=jnp.float32) / bs
    sq = (corr - jnp.eye(d)) ** 2
    weight = jnp.full((d, d), off_diagonal_weight).at[jnp.arange(d), jnp.arange(d)].set(1.0)
    return jnp.sum(sq * weight)


# ---------------------------------------------------------------------------
# ReLIC — NT-Xent + KL invariance (losses.py:154-201)
# ---------------------------------------------------------------------------

def relic_loss(zi, zj, z_orig, temperature: float = 1.0, alpha: float = 0.5,
               normalize: bool = True, corrected: bool = False):
    """Contrastive term == nt_xent. Invariance term compares, across the
    batch, the softmax over anchor-vs-original diagonal similarities of the
    two views. Parity quirk preserved by default: the reference feeds
    *probabilities* (not log-probs) as the KL input (losses.py:198-200), so
    with torch semantics kl = sum(p_j * (log p_j - p_i)); `corrected=True`
    computes the proper KL(p_j || p_i) = sum(p_j * (log p_j - log p_i))."""
    if normalize:
        zi_n, zj_n, zo_n = l2_normalize(zi), l2_normalize(zj), l2_normalize(z_orig)
    else:
        zi_n, zj_n, zo_n = zi, zj, z_orig
    contrastive = nt_xent(zi_n, zj_n, temperature=temperature, normalize=False)

    sim_io = jnp.sum(zi_n * zo_n, axis=-1) / temperature   # diag of zi zo^T
    sim_jo = jnp.sum(zj_n * zo_n, axis=-1) / temperature
    log_pj = jax.nn.log_softmax(sim_jo)
    if corrected:
        log_pi = jax.nn.log_softmax(sim_io)
        kl = jnp.sum(jnp.exp(log_pj) * (log_pj - log_pi))
    else:
        p_i = jax.nn.softmax(sim_io)
        kl = jnp.sum(jnp.exp(log_pj) * (log_pj - p_i))
    return contrastive + alpha * kl


# ---------------------------------------------------------------------------
# SwAV — Sinkhorn-Knopp codes + swapped prediction (losses.py:204-235)
# ---------------------------------------------------------------------------

def sinkhorn_codes(scores, eps: float = 0.05, n_iters: int = 3):
    """The reference's exact iteration (losses.py:213-224): Q = exp(s/eps)^T
    normalized to a doubly-semi-stochastic transport plan by alternating
    row (uniform over K prototypes) and column (uniform over B samples)
    scalings, then column-renormalized and transposed back to (B, K).

    Under a data-sharded batch the column axis is local but the row sums
    span the global batch — jit over globally-sharded arrays makes the
    `sum` collectives automatic. Wrapped in stop_gradient (reference runs
    under no_grad).

    The iteration runs in log domain (each step is the exact log of the
    reference's scaling step): exp(s/eps) overflows f32 whenever
    s/eps > 88, which SeLA's self-labelling hits on real head logits
    (eps = 1/lambda = 0.04 -> any logit above ~3.5), silently turning the
    whole plan into NaN and every argmax pseudo-label into 0 — measured as
    a full label collapse on the chip (VALIDATION.md, shapes100 SeLA row).
    logsumexp-normalized scalings are overflow/underflow-free at any eps;
    for well-conditioned inputs (SwAV's |s|<=1, eps 0.05) the result
    matches the linear-domain oracle to f32 rounding."""
    from jax.scipy.special import logsumexp

    def _codes(s):
        lq = (s / eps).T                            # (K, B) log kernel
        K, B = lq.shape
        lr = -jnp.log(K)                            # log uniform marginals
        lc = -jnp.log(B)

        def body(_, lq):
            lq = lq - logsumexp(lq, axis=1, keepdims=True) + lr
            lq = lq - logsumexp(lq, axis=0, keepdims=True) + lc
            return lq

        lq = jax.lax.fori_loop(0, n_iters, body, lq)
        return jnp.exp(lq - logsumexp(lq, axis=0, keepdims=True)).T

    return jax.lax.stop_gradient(_codes(scores))


def swav_loss(z1, z2, prototypes, bank_features=None, temperature: float = 0.1,
              sinkhorn_eps: float = 0.05, sinkhorn_iters: int = 3):
    """Swapped prediction: codes from view 1 supervise view 2 and vice versa
    (losses.py:226-235). `bank_features` (the reference's FeatureBank,
    swav.py:57-79) are concatenated to fatten the assignment problem."""
    if bank_features is not None:
        bank_features = jax.lax.stop_gradient(bank_features)
        z1 = jnp.concatenate([z1, bank_features], axis=0)
        z2 = jnp.concatenate([z2, bank_features], axis=0)
    s1 = jnp.dot(z1, prototypes.T, preferred_element_type=jnp.float32)
    s2 = jnp.dot(z2, prototypes.T, preferred_element_type=jnp.float32)
    q1 = sinkhorn_codes(s1, sinkhorn_eps, sinkhorn_iters)
    q2 = sinkhorn_codes(s2, sinkhorn_eps, sinkhorn_iters)
    p1 = jax.nn.log_softmax(s1 / temperature, axis=-1)
    p2 = jax.nn.log_softmax(s2 / temperature, axis=-1)
    return -0.5 * jnp.mean(jnp.sum(q1 * p2, axis=1) + jnp.sum(q2 * p1, axis=1))


# ---------------------------------------------------------------------------
# SeLA — self-labelling by alternating scaling (sela.py:146-166)
# ---------------------------------------------------------------------------

def sela_self_label(logits, alpha, beta, lmbda: float = 25.0, n_iters: int = 80):
    """The reference's batch-wise Sinkhorn-style self-labelling: P =
    log_softmax(logits)^lambda transposed to (K, B); alternate
    alpha = 1/(P beta), beta = 1/(alpha^T P) for n_iters; pseudo-labels =
    argmax over K of diag(alpha) P diag(beta). alpha/beta persist across
    batches (sela.py:73-74) — returned for threading through the scan.

    NOTE: with lambda an odd integer, P is negative (log-probs^25), matching
    torch.pow semantics exactly."""
    log_p = jax.nn.log_softmax(logits, axis=-1)
    P = (log_p ** lmbda).T                                   # (K, B)

    def body(_, ab):
        a, b = ab
        a = 1.0 / (P @ b)                                    # (K, 1)
        b = 1.0 / (a.T @ P).T                                # (B, 1)
        return a, b

    alpha, beta = jax.lax.fori_loop(0, n_iters, body, (alpha, beta))
    scaled = (alpha * P * beta.T).T                          # (B, K)
    pseudo = jnp.argmax(scaled, axis=-1)
    return pseudo, alpha, beta

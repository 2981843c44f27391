"""End-to-end learning signal: a short real training run on the structured
synthetic dataset must lift KNN accuracy well above chance and the loss must
fall — the mechanism the reference validates empirically (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from helpers import make_trainer


def test_simclr_learns_knn_signal(tmp_path):
    t = make_trainer("simclr", tmp_path, epochs=4, batch_size=64,
                     n_train=1024, n_test=256)
    images, labels = t._train_arrays
    state = t.state
    losses_per_epoch = []
    for e in range(4):
        idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(e))
        state, metrics = t._epoch_fn(state, images, labels, idx_mat,
                                    jax.random.PRNGKey(100 + e))
        losses_per_epoch.append(float(np.asarray(metrics["loss"]).mean()))
    t.state = state
    acc = t.knn_validate()
    # 10 synthetic classes -> chance is 0.1; the class-structured prototypes
    # are easily separable, a few epochs should push far beyond chance.
    assert acc > 0.35, (acc, losses_per_epoch)
    assert losses_per_epoch[-1] < losses_per_epoch[0]

    # linear probe should beat chance comfortably as well
    lin = t.perform_linear_eval()
    assert lin > 0.3, lin

"""Full-system learning demonstration (VERDICT r2 missing #4): joint
latent-learner + ComposedSTN training through the REAL loss/step machinery
on a synthetic differentiable generator with alignable structure
(train/synthetic.py). Asserts perceptual-loss descent after psi annealing
and congealed-variance collapse; the K=2 variant exercises
gangealing_cluster_loss's min-over-heads assignment end-to-end.
"""

import numpy as np
import pytest

from gangealing_tpu.train.synthetic import run_synthetic_congealing


def _post_anneal_descent(losses, anneal_end):
    """Mean loss right after psi hits 0 vs the final stretch. During
    annealing the loss RISES by design (the target mode pulls away from
    the input; reference loss.py:66-68 dynamics), so descent is only
    meaningful after the target is fixed."""
    early = np.mean(losses[anneal_end:anneal_end + 8])
    late = np.mean(losses[-8:])
    return early, late


@pytest.mark.slow
def test_synthetic_full_system_congeals():
    r = run_synthetic_congealing(iters=60, size=64, batch=8, num_heads=1,
                                 seed=0)
    anneal_end = max(1, int(60 * 0.3))
    early, late = _post_anneal_descent(r.losses, anneal_end)
    assert np.all(np.isfinite(r.losses))
    assert late < 0.75 * early, \
        f"no post-annealing descent: early {early:.5f} late {late:.5f}"
    assert r.var_after < 0.6 * r.var_before, \
        f"congealed variance did not collapse: " \
        f"{r.var_before:.4f} -> {r.var_after:.4f}"


@pytest.mark.slow
def test_synthetic_full_system_cluster_k2():
    """Two visual modes + num_heads=2: the cluster loss must assign each
    sample to a head and still congeal (loss.py:78-92 capability)."""
    r = run_synthetic_congealing(iters=60, size=64, batch=8, num_heads=2,
                                 seed=1)
    anneal_end = max(1, int(60 * 0.3))
    early, late = _post_anneal_descent(r.losses, anneal_end)
    assert np.all(np.isfinite(r.losses))
    assert late < 0.85 * early, \
        f"cluster demo: early {early:.5f} late {late:.5f}"
    assert r.var_after < 0.8 * r.var_before, \
        f"cluster congealed variance: " \
        f"{r.var_before:.4f} -> {r.var_after:.4f}"

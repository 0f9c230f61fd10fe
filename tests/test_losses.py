"""Loss math vs hand-computed cases (SURVEY.md SS5.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcgan_tpu.ops.gan_loss import gan_loss, gradient_penalty, r1_penalty
from pcgan_tpu.models.comparator import (
    comparison_loss, comparison_accuracy, condition_consistency_loss,
    ndtr, pairwise_log_probs)


def test_lsgan_values():
    logits = jnp.array([0.0, 1.0])
    assert np.isclose(float(gan_loss(logits, True, "lsgan")), 0.5)   # ((0-1)^2+(1-1)^2)/2
    assert np.isclose(float(gan_loss(logits, False, "lsgan")), 0.5)  # (0+1)/2


def test_vanilla_matches_formula():
    logits = jnp.array([0.3, -1.2, 2.0])
    x = np.asarray(logits)
    want_real = np.mean(np.log1p(np.exp(-x)))
    want_fake = np.mean(np.log1p(np.exp(x)))
    assert np.isclose(float(gan_loss(logits, True, "vanilla")), want_real, rtol=1e-4)
    assert np.isclose(float(gan_loss(logits, False, "vanilla")), want_fake, rtol=1e-4)


def test_wgan_and_hinge():
    logits = jnp.array([1.0, -3.0])
    assert np.isclose(float(gan_loss(logits, True, "wgangp")), 1.0)
    assert np.isclose(float(gan_loss(logits, False, "wgangp")), -1.0)
    assert np.isclose(float(gan_loss(logits, True, "hinge")), 2.0)   # relu(1-1)+relu(4) /2
    assert np.isclose(float(gan_loss(logits, False, "hinge")), 1.0)  # relu(2)+relu(-2) /2
    assert np.isclose(float(gan_loss(logits, True, "hinge", for_discriminator=False)), 1.0)


def test_gradient_penalty_zero_for_unit_slope():
    # D(x) = sum over pixels of x's first channel => grad norm = sqrt(HW), so
    # with a 1x1 image and 1 channel, |grad| = 1 -> penalty 0.
    def d_apply(variables, x, cond):
        return jnp.sum(x, axis=(1, 2, 3))
    real = jnp.ones((4, 1, 1, 1))
    fake = -jnp.ones((4, 1, 1, 1))
    gp = gradient_penalty(d_apply, {}, real, fake, None, jax.random.PRNGKey(0))
    assert float(gp) < 1e-8


def test_r1_penalty_linear_d():
    # D(x) = <w, x> per sample => grad_x D = w for every sample, so
    # E[||grad||^2] = sum(w^2) exactly, independent of the inputs.
    w = jnp.arange(1.0, 13.0).reshape(1, 2, 2, 3)

    def d_apply(variables, x, cond):
        return jnp.sum(x * variables["w"], axis=(1, 2, 3))

    real = jax.random.uniform(jax.random.PRNGKey(0), (5, 2, 2, 3)) * 2 - 1
    r1 = r1_penalty(d_apply, {"w": w}, real, None)
    np.testing.assert_allclose(float(r1), float(jnp.sum(w ** 2)), rtol=1e-6)


def test_r1_penalty_nonnegative_and_input_dependent():
    # nonlinear D: penalty positive and actually a function of the inputs
    def d_apply(variables, x, cond):
        return jnp.sum(jnp.tanh(x * variables["w"]) ** 2, axis=(1, 2, 3))

    w = jnp.full((1, 2, 2, 3), 0.7)
    a = r1_penalty(d_apply, {"w": w}, jnp.full((3, 2, 2, 3), 0.1), None)
    b = r1_penalty(d_apply, {"w": w}, jnp.full((3, 2, 2, 3), 0.9), None)
    assert float(a) > 0 and float(b) > 0 and not np.isclose(float(a), float(b))


def test_ndtr():
    assert np.isclose(float(ndtr(jnp.array(0.0))), 0.5)
    assert np.isclose(float(ndtr(jnp.array(1.6448536))), 0.95, atol=1e-4)


def test_pairwise_probs_sum_to_one():
    mu_i = jnp.array([1.0, -2.0]); mu_j = jnp.array([0.0, 0.0])
    lv = jnp.zeros(2)
    logp = pairwise_log_probs(mu_i, lv, mu_j, lv, margin=0.5)
    total = jnp.sum(jnp.exp(logp), axis=-1)
    np.testing.assert_allclose(np.asarray(total), 1.0, atol=1e-4)


def test_comparison_loss_prefers_correct_label():
    mu_i = jnp.array([3.0]); mu_j = jnp.array([0.0]); lv = jnp.zeros(1)
    l_correct = comparison_loss(mu_i, lv, mu_j, lv, jnp.array([0]))
    l_wrong = comparison_loss(mu_i, lv, mu_j, lv, jnp.array([1]))
    l_tie = comparison_loss(mu_i, lv, mu_j, lv, jnp.array([2]))
    assert float(l_correct) < float(l_tie) < float(l_wrong)
    acc = comparison_accuracy(mu_i, lv, mu_j, lv, jnp.array([0]))
    assert float(acc) == 1.0


def test_condition_consistency_in_bin_is_constant():
    mu = jnp.array([0.5]); lv = jnp.zeros(1)
    inside = condition_consistency_loss(mu, lv, jnp.array([0.0]), jnp.array([1.0]))
    outside = condition_consistency_loss(mu, lv, jnp.array([2.0]), jnp.array([3.0]))
    assert float(outside) > float(inside)
    # inside the bin the quadratic term vanishes (only the log-var prior stays)
    assert np.isclose(float(inside), 0.0, atol=1e-6)

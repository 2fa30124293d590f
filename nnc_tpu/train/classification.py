"""Classification task support: metrics, train/eval loops, and a generic
LSA-capable executer for classifier models expressed as JAX apply functions.

TPU-native counterpart of the reference's ImageNet path
(reference: framework/applications/utils/train.py:15-83, evaluation.py:13-101,
metrics.py:5-20; executer: framework/pytorch_model/__init__.py:613-919). The
model is a user-supplied pure function ``apply_fn(params, ls, x) -> logits``
(plus its parameter pytrees); LSA optimizes only the scale pytree, with
per-epoch best-loss checkpointing and early stopping like the reference.
"""
from __future__ import annotations

import copy
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.model import ModelExecute


def get_topk_accuracy(logits, labels, k=1):
    """Fraction of rows whose label is within the top-k logits.
    (reference: metrics.py:5-20)"""
    topk = jnp.argsort(logits, axis=-1)[:, -k:]
    return jnp.mean(jnp.any(topk == labels[:, None], axis=-1))


def cross_entropy(logits, labels):
    return jnp.mean(
        -jax.nn.log_softmax(logits)[jnp.arange(labels.shape[0]), labels])


def evaluate_classification_model(apply_fn, params, ls, dataloader,
                                  max_batches=None, verbose=False):
    """Returns (top1, top5, mean loss). (reference: evaluation.py:13-101)"""
    e = jax.jit(lambda p, s, x: apply_fn(p, s, x))
    top1s, top5s, losses, ns = [], [], [], []
    for i, (x, y) in enumerate(dataloader):
        if max_batches is not None and i >= max_batches:
            break
        logits = e(params, ls, jnp.asarray(x))
        y = jnp.asarray(y)
        top1s.append(float(get_topk_accuracy(logits, y, 1)))
        top5s.append(float(get_topk_accuracy(logits, y, 5))
                     if logits.shape[-1] >= 5 else 1.0)
        losses.append(float(cross_entropy(logits, y)))
        ns.append(len(y))
    w = np.asarray(ns) / max(1, sum(ns))
    return (float(np.dot(top1s, w)), float(np.dot(top5s, w)),
            float(np.dot(losses, w)))


def train_classification_model(apply_fn, params, ls, train_loader, *,
                               learning_rate=1e-4, max_batches=600,
                               train_scales_only=True, verbose=False):
    """One epoch of Adam on the LSA scales (or all params).
    Returns (new params, new ls, mean loss, mean top1).
    (reference: train.py:15-83)"""
    optimizer = optax.adam(learning_rate)

    if train_scales_only:
        trainable, frozen = ls, params
        loss_of = lambda t, f, x, y: cross_entropy(apply_fn(f, t, x), y)
    else:
        trainable, frozen = params, ls
        loss_of = lambda t, f, x, y: cross_entropy(apply_fn(t, f, x), y)

    opt_state = optimizer.init(trainable)

    @jax.jit
    def step(trainable, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_of)(trainable, frozen, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        logits = apply_fn(frozen, trainable, x) if train_scales_only \
            else apply_fn(trainable, frozen, x)
        return trainable, opt_state, loss, get_topk_accuracy(logits, y, 1)

    losses, accs = [], []
    for i, (x, y) in enumerate(train_loader):
        if i >= max_batches:
            break
        trainable, opt_state, loss, acc = step(
            trainable, opt_state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
        accs.append(float(acc))
    if train_scales_only:
        return params, trainable, float(np.mean(losses)), float(np.mean(accs))
    return trainable, ls, float(np.mean(losses)), float(np.mean(accs))


class ClassificationExecuter(ModelExecute):
    """LSA/FT/IOQ executer for classifiers.

    model_builder(parameters: flat numpy dict) ->
        (apply_fn(params, ls, x)->logits, params pytree, ls pytree,
         extract(params, ls) -> flat numpy dict of tuned tensors)
    """

    def __init__(self, model_builder, train_loader_fn, val_loader_fn=None,
                 test_loader_fn=None, *, learning_rate=1e-4, epochs=2,
                 max_batches=600, patience=2, verbose=True):
        self.model_builder = model_builder
        self.train_loader_fn = train_loader_fn
        self.val_loader_fn = val_loader_fn or train_loader_fn
        self.test_loader_fn = test_loader_fn or self.val_loader_fn
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.max_batches = max_batches
        self.patience = patience
        self.verbose = verbose

    def tune_model(self, bitstream_path=None, parameters=None,
                   param_types=None, lsa_flag=True, ft_flag=False,
                   verbose=False):
        apply_fn, params, ls, extract = self.model_builder(parameters)
        best = None
        worse_epochs = 0
        for epoch in range(self.epochs):
            params, ls, loss, acc = train_classification_model(
                apply_fn, params, ls, self.train_loader_fn(),
                learning_rate=self.learning_rate,
                max_batches=self.max_batches,
                train_scales_only=not ft_flag)
            _t1, _t5, vloss = evaluate_classification_model(
                apply_fn, params, ls, self.val_loader_fn(),
                max_batches=self.max_batches)
            if self.verbose:
                print(f"epoch {epoch}: train loss {loss:.4f} acc {acc:.3f} "
                      f"val loss {vloss:.4f}")
            if best is None or vloss < best[0]:  # best-loss checkpointing
                best = (vloss, copy.deepcopy(extract(params, ls)))
                worse_epochs = 0
            else:
                # patience-based early stopping (reference
                # pytorch_model/__init__.py:856-866)
                worse_epochs += 1
                if worse_epochs >= self.patience:
                    if self.verbose:
                        print(f"early stopping after epoch {epoch} "
                              f"(patience {self.patience})")
                    break
        tuned = best[1]
        lsa_params = {k: v for k, v in tuned.items()
                      if k.endswith("weight_scaling")} if lsa_flag else {}
        ft_params = {k: v for k, v in tuned.items()
                     if not k.endswith("weight_scaling")} if ft_flag else {}
        return lsa_params, ft_params

    def eval_model(self, parameters, verbose=False):
        apply_fn, params, ls, _ = self.model_builder(parameters)
        return evaluate_classification_model(
            apply_fn, params, ls, self.val_loader_fn(),
            max_batches=self.max_batches)

    def test_model(self, parameters, verbose=False):
        apply_fn, params, ls, _ = self.model_builder(parameters)
        return evaluate_classification_model(
            apply_fn, params, ls, self.test_loader_fn(),
            max_batches=self.max_batches)

    def has_eval(self):
        return True

    def has_test(self):
        return True

    def has_tune_ft(self):
        return True

    def has_tune_lsa(self):
        return True


def mlp_classifier_builder(layer_prefixes):
    """Builder factory for simple torch-layout MLP classifiers
    (``{p}.weight``/``.bias``/optionally ``.weight_scaling``): relu between
    layers, logits at the end. Used for tests and as a template."""

    def build(parameters):
        params, ls = {}, {}
        for p in layer_prefixes:
            params[p] = {
                "w": jnp.asarray(np.asarray(parameters[p + ".weight"]).T),
                "b": jnp.asarray(parameters[p + ".bias"]),
            }
            ls_key = p + ".weight_scaling"
            ls[p] = jnp.asarray(
                np.asarray(parameters[ls_key]).reshape(-1)) \
                if ls_key in parameters else \
                jnp.ones((params[p]["w"].shape[1],), jnp.float32)

        def apply_fn(params, ls, x):
            h = x
            for i, p in enumerate(layer_prefixes):
                w = params[p]["w"] * ls[p][None, :]
                h = h @ w + params[p]["b"]
                if i < len(layer_prefixes) - 1:
                    h = jax.nn.relu(h)
            return h

        def extract(params, ls):
            out = {}
            for p in layer_prefixes:
                out[p + ".weight"] = np.asarray(params[p]["w"]).T.copy()
                out[p + ".bias"] = np.asarray(params[p]["b"]).copy()
                out[p + ".weight_scaling"] = \
                    np.asarray(ls[p]).reshape(-1, 1).copy()
            return out

        return apply_fn, params, ls, extract

    return build

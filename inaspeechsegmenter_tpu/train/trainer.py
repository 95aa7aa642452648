"""Multi-chip training for the patch-CNN model family.

The reference is inference-only (its CNNs ship pre-trained); this module adds
the missing training capability the TPU-native way: a single `train_step`
jitted over a (data, model) `Mesh` — batches sharded across the data axis,
the large Dense kernels sharded across the model axis (tensor parallel), the
rest replicated — with XLA inserting the gradient all-reduces from the
sharding annotations alone.

Works with any imported/synthetic model spec (softmax stripped to logits for
the loss).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.keras_h5 import build_forward, strip_final_softmax


def param_shardings(mesh, params, model_axis="model"):
    """Sharding pytree: 2-D kernels with >=512 rows are tensor-sharded on
    their output dim; everything else is replicated."""
    def shard_of(a):
        a = np.asarray(a)
        if a.ndim == 2 and a.shape[0] >= 512 and \
                a.shape[1] % mesh.shape[model_axis] == 0:
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard_of, params)


class Trainer:
    """Train a patch-CNN (or MLP) spec on labeled patches.

    :param spec: model spec (Keras-imported or synthetic).
    :param params: parameter pytree.
    :param mesh: a (data, model) Mesh; defaults to all devices on 'data'.
    :param class_weight: optional (n_classes,) per-class loss weights
        (e.g. `train.data.class_weights` for imbalanced annotated
        corpora); None = unweighted.
    """

    def __init__(self, spec, params, mesh=None, learning_rate=1e-3,
                 class_weight=None):
        if mesh is None:
            from ..parallel.mesh import make_2d_mesh

            mesh = make_2d_mesh(model=1)
        self.mesh = mesh
        self.spec = spec  # original (softmax kept): export_model ships it
        self.forward = build_forward(strip_final_softmax(spec))
        self.optimizer = optax.adam(learning_rate)

        self._pshard = param_shardings(mesh, params)
        self.params = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(jnp.asarray(a), s), params,
            self._pshard)
        self.opt_state = self.optimizer.init(self.params)
        self._data_n = int(mesh.shape["data"])

        cw = (None if class_weight is None
              else jnp.asarray(class_weight, jnp.float32))

        def loss_fn(p, x, y):
            logits = self.forward(p, x)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
            if cw is not None:
                nll = nll * cw[y]
            return jnp.mean(nll)

        @jax.jit
        def step(p, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
            updates, opt_state = self.optimizer.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, loss

        self._step = step

    def shard_batch(self, x, y):
        x = jnp.asarray(x)
        if x.shape[0] % self._data_n:
            raise ValueError(
                f"batch size {x.shape[0]} is not divisible by the mesh "
                f"data axis ({self._data_n}); use fit(), which rounds the "
                "batch size to a mesh-divisible value")
        from ..parallel.mesh import shard_batch as _shard

        return _shard(self.mesh, x), _shard(self.mesh, jnp.asarray(y))

    def train_step(self, x, y):
        """One sharded optimization step; returns the scalar loss."""
        x, y = self.shard_batch(x, y)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, x, y)
        return float(loss)

    def fit(self, x, y, epochs=1, batch_size=None, shuffle_seed=0):
        """Minimal epoch loop over host arrays.

        The tail partial batch of each epoch is dropped (static-shape
        steps); a batch_size larger than the dataset is clamped to the
        dataset so small datasets still train instead of silently running
        zero steps.  Batch sizes are rounded down to a multiple of the
        mesh data axis (sharding requires divisibility); a dataset smaller
        than the data axis is tiled up to it so it still trains.
        """
        n = len(x)
        if n == 0:
            return []
        d = self._data_n
        if n < d:
            reps = -(-d // n)
            x = np.concatenate([np.asarray(x)] * reps)[:d]
            y = np.concatenate([np.asarray(y)] * reps)[:d]
            n = d
        batch_size = min(batch_size or n, n)
        batch_size = max(d, batch_size - batch_size % d)
        rng = np.random.default_rng(shuffle_seed)
        losses = []
        for _ in range(epochs):
            order = rng.permutation(n)
            for i in range(0, n - batch_size + 1, batch_size):
                idx = order[i:i + batch_size]
                losses.append(self.train_step(x[idx], y[idx]))
        return losses

    def predict_proba(self, x):
        logits = self.forward(self.params, jnp.asarray(x))
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def evaluate(self, x, y):
        """Top-1 accuracy on host arrays (held-out evaluation)."""
        return float((self.predict_proba(x).argmax(axis=1)
                      == np.asarray(y)).mean())

    def export_model(self, path):
        """Deploy the trained parameters as a registry-loadable native npz.

        Writes the ORIGINAL spec (softmax head kept — serving wants
        probabilities) plus the current parameter values, in the same
        native format `load_patch_model` resolves (models/registry.py), so
        a trained model drops into the fused pipeline by placing the file
        in ISS_TPU_MODEL_DIR under the registry stem.  The `synthetic`
        marker is replaced by `trained` — the stand-in warning must not
        fire for weights that were actually fit to data.
        """
        from .. import __version__ as _ver
        from ..models.keras_h5 import save_native

        spec = dict(self.spec)
        spec.pop("synthetic", None)
        spec["trained"] = {"framework_version": _ver}
        host_params = {k: [np.asarray(a) for a in v]
                       for k, v in self.params.items()}
        save_native(path, spec, host_params)
        return path

    # -- checkpoint / resume -------------------------------------------------
    # The reference has file-granular resume only (skipifexist); training
    # state checkpointing is a framework addition: full (params, opt_state)
    # round-trip through one npz, shardings re-applied on restore so a
    # resumed run continues bit-identically on the same mesh.

    @staticmethod
    def _ckpt_path(path):
        # np.savez appends '.npz' to extension-less paths but np.load does
        # not — normalize once so save/restore round-trip with one path
        return path if str(path).endswith(".npz") else str(path) + ".npz"

    def save_checkpoint(self, path):
        leaves = jax.tree_util.tree_leaves((self.params, self.opt_state))
        np.savez(self._ckpt_path(path),
                 **{f"leaf_{i:05d}": np.asarray(a)
                    for i, a in enumerate(leaves)})

    def restore_checkpoint(self, path):
        path = self._ckpt_path(path)
        treedef = jax.tree_util.tree_structure((self.params, self.opt_state))
        with np.load(path) as z:
            leaves = [z[k] for k in sorted(z.files)]
        own = jax.tree_util.tree_leaves((self.params, self.opt_state))
        if len(leaves) != treedef.num_leaves:
            raise ValueError(
                f"checkpoint {path} has {len(leaves)} arrays, model expects "
                f"{treedef.num_leaves} — architecture mismatch")
        for i, (a, b) in enumerate(zip(own, leaves)):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"checkpoint {path} leaf {i} has shape {np.shape(b)}, "
                    f"model expects {np.shape(a)} — architecture mismatch")
        params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        self.params = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(jnp.asarray(a), s), params,
            self._pshard)
        def put_opt(old, new):
            sh = getattr(old, "sharding", None)
            if not isinstance(sh, NamedSharding):
                # scalar counts etc. — replicate on the mesh so every leaf
                # lives on the same device set as the params
                sh = NamedSharding(self.mesh, P())
            return jax.device_put(jnp.asarray(new), sh)

        self.opt_state = jax.tree_util.tree_map(put_opt, self.opt_state,
                                                opt_state)

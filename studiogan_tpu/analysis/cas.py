"""Classifier Accuracy Score (CAS): GAN_train / GAN_test
(parity with reference src/worker.py:1515-1668 + src/metrics/resnet.py).

GAN_train (CAS recall): train the classifier on GENERATED images,
evaluate on real validation data.  GAN_test (CAS precision): train on
real data, evaluate on generated images.  The classifier is the
reference's CIFAR-style bottleneck ResNet (metrics/resnet.py:81-172),
trained with the cas_setting hyperparameters (config.py MISC.cas_setting).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

Array = jax.Array


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5)
        residual = x
        out = bn()(x)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(out)
        out = bn()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False)(out)
        out = bn()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, name="downsample")(x)
        return out + residual


class CASResNet(nn.Module):
    """CIFAR-style pre-act bottleneck ResNet (reference metrics/resnet.py:81)."""
    depth: int = 32
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train=True):
        n = (self.depth - 2) // 9
        x = nn.Conv(16, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        for i in range(n):
            x = BottleneckBlock(16, stride=1, name=f"layer1_{i}")(x, train)
        for i in range(n):
            x = BottleneckBlock(32, stride=2 if i == 0 else 1,
                                name=f"layer2_{i}")(x, train)
        for i in range(n):
            x = BottleneckBlock(64, stride=2 if i == 0 else 1,
                                name=f"layer3_{i}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn_final")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


def _accuracy(logits, labels, topk=(1, 5)):
    order = jnp.argsort(-logits, axis=1)
    out = []
    for k in topk:
        out.append(float(jnp.mean((order[:, :k] == labels[:, None]).any(axis=1))))
    return out


def compute_cas(engine, state, train_dataset, valid_dataset, setting: dict,
                GAN_train: bool = False, GAN_test: bool = False,
                epochs: int | None = None, rng=None, logger=None,
                ckpt_dir: str | None = None, resume: bool = False) -> dict:
    """Train classifier per CAS protocol, return top1/top5.
    ckpt_dir/resume: classifier checkpointing (reference ckpt.py:177-202,
    'model=C-*-weights' and the -resume_ct flag)."""
    assert GAN_train != GAN_test
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    num_classes = engine.cfg.DATA.num_classes
    bs = setting["batch_size"]
    epochs = epochs if epochs is not None else setting["epochs"]

    model = CASResNet(depth=setting["depth"], num_classes=num_classes)
    img_size = engine.cfg.DATA.img_size
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img_size, img_size, 3)))
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.chain(
        optax.add_decayed_weights(setting["weight_decay"]),
        optax.sgd(setting["lr"], momentum=setting["momentum"]))
    opt_state = tx.init(params)

    start_epoch = 0
    c_path = None
    if ckpt_dir is not None:
        import os

        import orbax.checkpoint as ocp
        c_path = os.path.abspath(os.path.join(ckpt_dir, "model=C-current-weights"))
        if resume and os.path.exists(c_path):
            target = dict(params=jax.device_get(params),
                          batch_stats=jax.device_get(bstats),
                          opt_state=jax.device_get(opt_state),
                          epoch=0)
            restored = ocp.PyTreeCheckpointer().restore(c_path, item=target)
            params, bstats = restored["params"], restored["batch_stats"]
            opt_state, start_epoch = restored["opt_state"], int(restored["epoch"])
            if logger:
                logger.info("Resumed CAS classifier at epoch %d", start_epoch)

    @jax.jit
    def train_step(params, bstats, opt_state, imgs, labels):
        def loss_fn(p):
            logits, new = model.apply({"params": p, "batch_stats": bstats},
                                      imgs, train=True,
                                      mutable=["batch_stats"])
            logp = jax.nn.log_softmax(logits)
            loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))
            return loss, new["batch_stats"]
        (loss, new_bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bstats, opt_state, loss

    n_train = len(train_dataset)
    steps_per_epoch = max(n_train // bs, 1)
    for epoch in range(start_epoch, epochs):
        for step in range(steps_per_epoch):
            rng, k = jax.random.split(rng)
            if GAN_train:  # classifier trained on fakes
                imgs, labels = engine.generate(state, k, bs)
                imgs = jnp.asarray(imgs)
            else:
                idx = np.random.RandomState((epoch, step).__hash__() & 0xFFFF
                                            ).randint(0, n_train, bs)
                imgs = jnp.asarray(np.stack(
                    [train_dataset[int(i)][0] for i in idx]
                ).astype(np.float32) / 127.5 - 1.0)
                labels = jnp.asarray([train_dataset[int(i)][1] for i in idx])
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state, imgs, labels)
        if logger:
            logger.info("CAS classifier epoch %d loss %.4f", epoch, float(loss))
        if c_path is not None:
            import orbax.checkpoint as ocp
            ocp.PyTreeCheckpointer().save(
                c_path, dict(params=jax.device_get(params),
                             batch_stats=jax.device_get(bstats),
                             opt_state=jax.device_get(opt_state),
                             epoch=epoch + 1), force=True)

    # evaluation
    @jax.jit
    def infer(imgs):
        return model.apply({"params": params, "batch_stats": bstats},
                           imgs, train=False)

    top1s, top5s = [], []
    if GAN_test:  # evaluate on fakes
        for i in range(max(len(valid_dataset) // bs, 1)):
            rng, k = jax.random.split(rng)
            imgs, labels = engine.generate(state, k, bs)
            logits = infer(jnp.asarray(imgs))
            t1, t5 = _accuracy(logits, labels)
            top1s.append(t1)
            top5s.append(t5)
    else:  # GAN_train: evaluate on real validation data
        for start in range(0, len(valid_dataset), bs):
            idx = range(start, min(start + bs, len(valid_dataset)))
            imgs = jnp.asarray(np.stack(
                [valid_dataset[i][0] for i in idx]
            ).astype(np.float32) / 127.5 - 1.0)
            labels = jnp.asarray([valid_dataset[i][1] for i in idx])
            t1, t5 = _accuracy(infer(imgs), labels)
            top1s.append(t1)
            top5s.append(t5)
    return dict(top1=float(np.mean(top1s)), top5=float(np.mean(top5s)))

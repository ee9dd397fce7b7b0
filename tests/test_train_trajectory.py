"""Multi-step TRAINING trajectory parity vs the torch reference.

The eval-side correctness gates (converted-weight forward parity, the
on-chip exact-vs-AMP drift gate) say nothing about the backward pass.
This test trains the SAME model from the SAME weights on the SAME batches
in both frameworks — torch autograd + torch.optim.SGD vs our jitted
value_and_grad + optax — and requires the per-step losses and final
weights to track.  It covers, end to end: kNN graph construction under
gradients, the gather/concat edge features' VJP, EdgeConv ConvBN
(train-mode batch statistics), global pooling, the label-smoothing CE
(reference loss.py:4-21), and SGD-with-momentum semantics
(reference main_cls.py:65-70 builds the same optimizer).

Sizes sit below the Pallas envelope on purpose: this pins the XLA
reference path to torch; tests/test_pallas_train_path.py separately pins
the fused Pallas training kernels to that XLA path.  Together they chain
torch == XLA == Pallas.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference

B, N, K, EMB, C = 4, 32, 6, 32, 5
STEPS, LR, MOM = 6, 0.05, 0.9


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


@requires_reference
def test_sgd_training_trajectory_matches_torch():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from loss import cross_entropy as ref_ce
    from models.dgcnn import DGCNN as RefDGCNN

    from dgcnn_tpu.convert import convert_dgcnn_backbone
    from dgcnn_tpu.models import DGCNN
    from dgcnn_tpu.train.loss import cross_entropy

    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    batches = [
        (rng.randn(B, 3, N).astype(np.float32), rng.randint(0, C, B))
        for _ in range(2)
    ]

    # ---- torch: reference backbone + linear head, SGD momentum ----------
    ref = RefDGCNN(_Args(emb_dim=EMB, k=K)).train()
    head = torch.nn.Linear(EMB, C)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    w0 = head.weight.detach().numpy().copy()
    b0 = head.bias.detach().numpy().copy()
    opt = torch.optim.SGD(
        list(ref.parameters()) + list(head.parameters()), lr=LR,
        momentum=MOM)
    torch_losses = []
    for step in range(STEPS):
        x, y = batches[step % 2]
        feats = ref(torch.from_numpy(x))          # (B, EMB, N)
        logits = head(feats.max(dim=-1)[0])
        loss = ref_ce(logits, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- jax: converted initial weights, same schedule -------------------
    import optax

    bb_params, bb_stats = convert_dgcnn_backbone(
        {k: v.numpy() for k, v in init_sd.items()})
    backbone = DGCNN(emb_dims=EMB, k=K)
    params = {"bb": bb_params, "w": jnp.asarray(w0.T), "b": jnp.asarray(b0)}
    tx = optax.sgd(LR, momentum=MOM)
    opt_state = tx.init(params)

    def loss_fn(p, stats, x, y):
        feats, mut = backbone.apply(
            {"params": p["bb"], "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])               # (B, N, EMB)
        logits = jnp.max(feats, axis=1) @ p["w"] + p["b"]
        return cross_entropy(logits, y), mut["batch_stats"]

    @jax.jit
    def step_fn(p, stats, opt_state, x, y):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, x, y)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_stats, opt_state, loss

    jax_losses = []
    stats = bb_stats
    with jax.default_matmul_precision("float32"):
        for step in range(STEPS):
            x, y = batches[step % 2]
            params, stats, opt_state, loss = step_fn(
                params, stats, opt_state,
                jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(y))
            jax_losses.append(float(loss))

    # per-step losses track torch's (f32 accumulation drift grows with
    # depth x steps; observed deltas are ~1e-6 at step 0)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=0, atol=5e-4)

    # final weights track too: spot-check first conv kernel + the head
    got_w = np.asarray(params["w"]).T
    np.testing.assert_allclose(got_w, head.weight.detach().numpy(),
                               atol=1e-3)
    # our EdgeConv factorizes the 1x1 conv over concat(feature_j, x_i)
    # into w_nbr (first 3 input channels) / w_ctr (last 3)
    want_k = ref.conv1[0].weight.detach().numpy()[:, :, 0, 0]  # (64, 6)
    got_nbr = np.asarray(params["bb"]["conv1"]["w_nbr"])       # (3, 64)
    got_ctr = np.asarray(params["bb"]["conv1"]["w_ctr"])
    np.testing.assert_allclose(got_nbr.T, want_k[:, :3], atol=1e-3)
    np.testing.assert_allclose(got_ctr.T, want_k[:, 3:], atol=1e-3)

    # running BN statistics follow torch's update rule (incl. the
    # unbiased-variance estimator torch uses for running_var)
    np.testing.assert_allclose(np.asarray(stats["conv1"]["mean"]),
                               ref.conv1[1].running_mean.detach().numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(stats["conv1"]["var"]),
                               ref.conv1[1].running_var.detach().numpy(),
                               rtol=1e-3)


@requires_reference
def test_adamw_onecycle_trajectory_matches_torch():
    """The fork's actual non-SGD configuration (main_partseg_dist.py:205,
    :212): AdamW(lr, wd 1e-4) + OneCycleLR stepped per batch WITH its
    default momentum cycling (torch cycles Adam's beta1 0.95->0.85->0.95
    alongside the lr).  make_optimizer(momentum_schedule=...) +
    make_schedule("cycle") must produce torch's trajectory."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from loss import cross_entropy as ref_ce
    from models.dgcnn import DGCNN as RefDGCNN

    from dgcnn_tpu.convert import convert_dgcnn_backbone
    from dgcnn_tpu.models import DGCNN
    from dgcnn_tpu.train import make_optimizer, make_schedule
    from dgcnn_tpu.train.loss import cross_entropy
    from dgcnn_tpu.train.schedules import make_momentum_schedule

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    epochs, spe, lr = 3, 2, 0.01
    batches = [
        (rng.randn(B, 3, N).astype(np.float32), rng.randint(0, C, B))
        for _ in range(2)
    ]

    ref = RefDGCNN(_Args(emb_dim=EMB, k=K)).train()
    head = torch.nn.Linear(EMB, C)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    w0 = head.weight.detach().numpy().copy()
    b0 = head.bias.detach().numpy().copy()
    opt = torch.optim.AdamW(
        list(ref.parameters()) + list(head.parameters()), lr=lr,
        weight_decay=1e-4)
    sch = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, epochs=epochs, steps_per_epoch=spe)
    torch_losses = []
    for step in range(epochs * spe):
        x, y = batches[step % 2]
        logits = head(ref(torch.from_numpy(x)).max(dim=-1)[0])
        loss = ref_ce(logits, torch.from_numpy(y))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sch.step()
        torch_losses.append(float(loss.detach()))

    import optax

    bb_params, bb_stats = convert_dgcnn_backbone(
        {k: v.numpy() for k, v in init_sd.items()})
    backbone = DGCNN(emb_dims=EMB, k=K)
    params = {"bb": bb_params, "w": jnp.asarray(w0.T), "b": jnp.asarray(b0)}
    # use_sgd=False keeps the raw lr (no x100), exactly the torch setup
    tx = make_optimizer(
        use_sgd=False, adamw=True,
        schedule=make_schedule("cycle", lr, epochs=epochs,
                               steps_per_epoch=spe, use_sgd=False),
        momentum_schedule=make_momentum_schedule("cycle", epochs=epochs,
                                                 steps_per_epoch=spe))
    opt_state = tx.init(params)

    def loss_fn(p, stats, x, y):
        feats, mut = backbone.apply(
            {"params": p["bb"], "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])
        logits = jnp.max(feats, axis=1) @ p["w"] + p["b"]
        return cross_entropy(logits, y), mut["batch_stats"]

    @jax.jit
    def step_fn(p, stats, opt_state, x, y):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, stats, x, y)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_stats, opt_state, loss

    jax_losses = []
    stats = bb_stats
    with jax.default_matmul_precision("float32"):
        for step in range(epochs * spe):
            x, y = batches[step % 2]
            params, stats, opt_state, loss = step_fn(
                params, stats, opt_state,
                jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(y))
            jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(params["w"]).T,
                               head.weight.detach().numpy(), atol=2e-3)

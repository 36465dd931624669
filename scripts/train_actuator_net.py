"""Actuator-network training pipeline.

TPU port of the reference ``scripts_archived_0/actuator_net`` trainer: fits
the softsign MLP (6 -> 32 -> 32 -> 1, utils.py:27-34,66-76) mapping per-joint
(q_err, q_err_last, q_err_last2, qd, qd_last, qd_last2) -> torque from logged
robot data, and writes the weights to ``assets/actuator_nets/<name>.npz`` in
the layout consumed by ``actuation/actuators.py``.

Input: a pickle/npz log with arrays ``joint_pos_target`` (T, 12),
``joint_pos`` (T, 12), ``joint_vel`` (T, 12), ``tau_est`` (T, 12) — the format
produced by the deployment logger.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(log):
    q_err = log["joint_pos_target"] - log["joint_pos"]   # (T, 12)
    qd = log["joint_vel"]
    tau = log["tau_est"]
    xs, ys = [], []
    for t in range(2, q_err.shape[0]):
        x = np.stack([q_err[t], q_err[t - 1], q_err[t - 2],
                      qd[t], qd[t - 1], qd[t - 2]], axis=-1)  # (12, 6)
        xs.append(x)
        ys.append(tau[t])
    X = np.concatenate(xs, axis=0)          # (N*12, 6)
    Y = np.concatenate(ys, axis=0)[:, None]  # (N*12, 1)
    return X.astype(np.float32), Y.astype(np.float32)


def main(args):
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    if args.log.endswith(".npz"):
        log = dict(np.load(args.log))
    else:
        with open(args.log, "rb") as f:
            log = pickle.load(f)
    X, Y = build_dataset(log)
    print(f"dataset: {X.shape[0]} samples")

    key = jax.random.key(args.seed)
    k0, k1, k2 = jax.random.split(key, 3)

    def init_linear(k, i, o):
        return (jax.random.uniform(k, (o, i), minval=-1, maxval=1) / np.sqrt(i),
                jnp.zeros(o))

    params = {
        "w0b0": init_linear(k0, 6, 32),
        "w1b1": init_linear(k1, 32, 32),
        "w2b2": init_linear(k2, 32, 1),
    }

    def softsign(x):
        return x / (1.0 + jnp.abs(x))

    def forward(p, x):
        h = softsign(x @ p["w0b0"][0].T + p["w0b0"][1])
        h = softsign(h @ p["w1b1"][0].T + p["w1b1"][1])
        return h @ p["w2b2"][0].T + p["w2b2"][1]

    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean(jnp.square(forward(p, xb) - yb))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(args.seed)
    n = X.shape[0]
    for epoch in range(args.epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - args.batch, args.batch):
            idx = perm[i:i + args.batch]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(X[idx]), jnp.asarray(Y[idx]))
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.5f}")

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "assets", "actuator_nets", f"{args.name}.npz")
    np.savez(out,
             w0=np.asarray(params["w0b0"][0]), b0=np.asarray(params["w0b0"][1]),
             w1=np.asarray(params["w1b1"][0]), b1=np.asarray(params["w1b1"][1]),
             w2=np.asarray(params["w2b2"][0]), b2=np.asarray(params["w2b2"][1]))
    print(f"wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True)
    p.add_argument("--name", default="actuator_net")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    main(p.parse_args())

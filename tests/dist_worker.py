"""Worker process for the 2-process jax.distributed CPU test.

Launched by tests/test_distributed.py::test_two_process_runner_matches_single
as N separate OS processes, each owning 8//N virtual CPU devices. Together
they form one global 8-device ``data`` mesh and run the REAL Runner path
(parallel/distributed.py + learn/runner.py distributed=True): host-sharded
env state, per-host terrain from the shared config seed, replicated params,
cross-process (Gloo on CPU; ICI/DCN on TPU pods) gradient all-reduce.

Usage: python dist_worker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import pickle
import sys


def main():
    pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    import jax  # pre-imported by sitecustomize; XLA_FLAGS set by the parent
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from legged_tracking_tpu.parallel import init_distributed

    idx, cnt = init_distributed(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=nprocs, process_id=pid)
    assert (idx, cnt) == (pid, nprocs), (idx, cnt)
    assert len(jax.devices()) == 8, jax.devices()

    from test_distributed import make_env, small_runner

    runner = small_runner(make_env(), distributed=True)
    runner.learn(2, verbose=False)
    if idx == 0:
        import numpy as np
        params = jax.tree.map(np.asarray, runner.train_state.params)
        with open(os.path.join(outdir, "params_proc0.pkl"), "wb") as f:
            pickle.dump(params, f)
        # metrics history proves every process agreed on the host-side
        # curriculum/logging arithmetic (replicated metrics)
        with open(os.path.join(outdir, "history_proc0.pkl"), "wb") as f:
            pickle.dump(runner.history, f)
    print(f"worker {pid}/{nprocs} done", flush=True)


if __name__ == "__main__":
    main()

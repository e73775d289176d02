"""Device profile of the training step (same program bench_train.py times).

    python scripts/profile_train.py [batch] [remat]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, LOOP_N = 320, 896, 10
LOGDIR = "/tmp/oftpu_train_profile"


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.trainer import (TrainConfig,
                                               create_train_state,
                                               make_train_step)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    remat = len(sys.argv) > 2 and bool(int(sys.argv[2]))
    model = PWCDCNet(variant="new", dtype=jnp.bfloat16, precision="fast")
    cfg = TrainConfig(loss="multiscale", optimizer="adamw", lr=1e-4,
                      remat=remat)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), cfg,
                                   sample_shape=(1, 64, 64, 6))
    step = make_train_step(model, tx, cfg)
    key = jax.random.PRNGKey(1)
    data = {
        "images": jax.random.uniform(key, (batch, H, W, 6), jnp.float32),
        "flow": jax.random.normal(key, (batch, H, W, 2), jnp.float32) * 4,
        "valid": jnp.ones((batch, H, W), jnp.float32),
    }

    @jax.jit
    def chain(state, data):
        def body(i, s):
            d = {k: (v + i.astype(jnp.float32) * 1e-6
                     if v.dtype == jnp.float32 else v)
                 for k, v in data.items()}
            s2, _ = step(s, d)
            return s2
        return jax.lax.fori_loop(0, LOOP_N, body, state)

    jax.block_until_ready(chain(state, data))
    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    jax.block_until_ready(chain(state, data))
    jax.profiler.stop_trace()
    print("trace:", glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True))


if __name__ == "__main__":
    main()

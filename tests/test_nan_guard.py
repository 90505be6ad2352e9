"""train.nan_guard_period: the lag-1 finiteness guard's cadence.

The reference asserts loss finiteness every iteration (engine.py:297);
so does the default here. nan_guard_period=N trades detection lag (a NaN
can poison at most N optimizer steps) for one fewer blocking readback
per iteration through high-latency device relays. The guard must still
STOP the run — a poisoned state propagates NaN weights, so any later
check catches it.
"""

import numpy as np
import pytest

from rdpn6d_tpu.config import Config

from tests.test_fused_step import TINY, _grouped_inputs
from tests.test_grouped_train import multi_instance_ds  # noqa: F401


@pytest.mark.parametrize("period", [1, 3])
def test_nan_guard_stops_the_run(multi_instance_ds, tmp_path,  # noqa: F811
                                 period):
    import jax
    import jax.numpy as jnp

    from rdpn6d_tpu.data.pipeline import preprocess_rois_grouped
    from rdpn6d_tpu.engine.trainer import Trainer
    from rdpn6d_tpu.models import RDPN

    _, records = multi_instance_ds
    cfg = Config().apply_opts(TINY + [
        f'train.output_dir="{tmp_path}"',
        "train.log_period=1000",  # guard must fire WITHOUT a log event
        f"train.nan_guard_period={period}",
        "data.fused_train_step=false",
    ])
    frames, rois = _grouped_inputs(cfg, records)
    key = jax.random.PRNGKey(7)
    model = RDPN(cfg, dtype=jnp.float32)
    batch = preprocess_rois_grouped(cfg, frames, rois, key, train=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    trainer = Trainer(cfg, model, variables, total_iters=12)

    poisoned = dict(batch)
    poisoned["roi_img"] = batch["roi_img"] * jnp.float32(np.nan)

    def loader():
        yield batch          # iter 0: clean
        yield poisoned       # iter 1: NaN loss -> poisons the weights
        while True:
            yield batch

    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.train(loader(), start_iter=0)

"""IO (export/checkpoint) and utils (guards, timing) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from plasma_control_tpu.config import SimConfig
from plasma_control_tpu.io.export import build_run_dict, load_run, save_mat, save_npz
from plasma_control_tpu.io.checkpoint import load_params, restore_checkpoint, save_checkpoint, save_params
from plasma_control_tpu.utils.guards import check_invalid_value, temporal_average


class TestExport:
    def test_mat_npz_roundtrip(self, tmp_path):
        cfg = SimConfig(n_particles=10, n_mesh=8)
        snap = np.arange(20 * 3, dtype=np.float64).reshape(20, 3)
        mdic = build_run_dict(
            cfg, snap, np.ones(3), np.full(3, 2.0),
            coeff_cos=np.zeros((2, 3)), coeff_sin=np.ones((2, 3)),
            costs={"J_kl": np.arange(3.0)},
        )
        save_mat(str(tmp_path / "d.mat"), mdic)
        save_npz(str(tmp_path / "d.npz"), mdic)

        m = load_run(str(tmp_path / "d.mat"))
        np.testing.assert_allclose(m["snapshot"], snap)
        z = load_run(str(tmp_path / "d.npz"))
        np.testing.assert_allclose(z["snapshot"], snap)
        np.testing.assert_allclose(z["cost"]["J_kl"], np.arange(3.0))
        assert int(z["N"]) == 10


class TestCheckpoint:
    def test_params_roundtrip(self, tmp_path):
        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
        save_params(str(tmp_path / "p.msgpack"), params)
        like = {"w": jnp.zeros((2, 3)), "b": jnp.ones(3)}
        out = load_params(str(tmp_path / "p.msgpack"), like)
        np.testing.assert_allclose(np.asarray(out["w"]), np.arange(6.0).reshape(2, 3))

    def test_full_state_roundtrip(self, tmp_path):
        tree = {
            "x": jnp.arange(5.0),
            "v": jnp.ones(5),
            "key": jax.random.PRNGKey(3),
            "step": jnp.asarray(7),
        }
        save_checkpoint(str(tmp_path / "ckpt"), tree)
        out = restore_checkpoint(str(tmp_path / "ckpt"), like=tree)
        np.testing.assert_allclose(np.asarray(out["x"]), np.arange(5.0))
        assert int(out["step"]) == 7


class TestGuards:
    def test_check_invalid(self):
        assert not bool(check_invalid_value(jnp.ones(4)))
        assert bool(check_invalid_value(jnp.asarray([1.0, jnp.nan])))
        assert bool(check_invalid_value(jnp.asarray([1.0, jnp.inf])))
        assert bool(check_invalid_value(jnp.asarray([1e5])))  # overflow > 1e4

    def test_temporal_average(self):
        y = jnp.arange(10.0)
        out = np.asarray(temporal_average(y, 4))
        # interior: mean over [i-2, i+2) = i - 0.5
        np.testing.assert_allclose(out[3:7], np.arange(3.0, 7.0) - 0.5)


class TestTiming:
    def test_slope_time_positive(self):
        from plasma_control_tpu.utils.timing import slope_time, time_fn

        step = lambda c: c * 1.000001 + 1e-7
        t = slope_time(step, jnp.ones((64, 64)), r1=2, r2=32)
        assert t >= 0.0
        t2 = time_fn(jax.jit(lambda x: x + 1), jnp.ones(16), reps=3)
        assert t2 > 0.0


class TestMetrics:
    def test_jsonl_logging(self, tmp_path):
        import json
        from plasma_control_tpu.utils.metrics import MetricsLogger

        path = str(tmp_path / "m.jsonl")
        with MetricsLogger(path, run="test") as log:
            log.log("step", t=1, pe=jnp.asarray(0.5))
            log.log_series("trace", {"pe": np.arange(3.0)})
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["kind"] == "step" and lines[0]["run"] == "test"
        assert lines[0]["pe"] == 0.5
        assert lines[1]["pe"] == [0.0, 1.0, 2.0]

"""Checkpoint / warm-restart round-trip (SURVEY.md §5.4 — beyond-reference;
the reference has no checkpointing)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eigd_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


class TestRoundTrip:
    def test_pytree_round_trip(self, tmp_path):
        state = {"x": jnp.linspace(0.0, 1.0, 17),
                 "lam": jnp.asarray([1.0, 2.5, 2.5]),
                 "Q": jnp.arange(12.0).reshape(4, 3)}
        kind = save_checkpoint(str(tmp_path / "ckpt"), state)
        assert kind in ("orbax", "npz")
        like = {k: jnp.zeros_like(v) for k, v in state.items()}
        out = load_checkpoint(str(tmp_path / "ckpt"), like)
        for k in state:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(state[k]))

    def test_npz_fallback_round_trip(self, tmp_path, monkeypatch):
        """The single-host fallback must round-trip even without orbax."""
        import builtins

        real_import = builtins.__import__

        def no_orbax(name, *a, **kw):
            if name.startswith("orbax"):
                raise ImportError(name)
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", no_orbax)
        state = {"a": jnp.asarray([1.0, -2.0]),
                 "b": jnp.eye(3)}
        kind = save_checkpoint(str(tmp_path / "ck"), state)
        assert kind == "npz"
        out = load_checkpoint(str(tmp_path / "ck"),
                              {k: jnp.zeros_like(v) for k, v in state.items()})
        for k in state:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(state[k]))


class TestModelWarmRestart:
    def test_nf_save_restore_rearms_sign_continuity(self, tmp_path):
        """save_state -> fresh model -> restore_state: the design comes back
        and the checkpointed eigenvectors act as the sign-continuity
        reference for the next initialize()."""
        from eigd_tpu.models.natural_frequency import make_model

        topo = make_model(nx=8, ny=4, Lx=2.0, Ly=1.0, N=2, rfact=2.0, m=30)
        topo.x = jnp.asarray(topo.x) * 0.9
        topo.initialize()
        path = str(tmp_path / "state")
        topo.save_state(path)

        topo2 = make_model(nx=8, ny=4, Lx=2.0, Ly=1.0, N=2, rfact=2.0, m=30)
        topo2.restore_state(path)
        np.testing.assert_array_equal(np.asarray(topo2.x),
                                      np.asarray(topo.x))
        topo2.initialize()
        np.testing.assert_allclose(np.asarray(topo2.lam),
                                   np.asarray(topo.lam), rtol=1e-10)
        # sign continuity: restored-Q alignment means the two processes see
        # identical eigenvectors (no arbitrary sign flip across restart)
        np.testing.assert_allclose(np.asarray(topo2.Q), np.asarray(topo.Q),
                                   atol=1e-8)

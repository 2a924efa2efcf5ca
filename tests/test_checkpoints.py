"""CheckpointManager best-gate semantics (reference train.py:434-468).

Regression for the closed-loop finding: with a flat early metric (val F1
pinned at 0.0 while the CE leg still learns), a strictly-greater gate
pinned "best" to the FIRST checkpoint forever, so the eval CLI scored
the least-trained params. Ties must update (prefer most-trained).
"""

import jax.numpy as jnp

from interactvlm_tpu.train.checkpoints import CheckpointManager


def _state(v):
    return {"w": jnp.full((2,), float(v))}


def test_best_gate_tie_prefers_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.save_best(1, _state(1), score=0.0)
    # tie: must update to the more-trained params
    assert mgr.save_best(2, _state(2), score=0.0)
    got = mgr.restore_best(_state(0))
    assert float(got["w"][0]) == 2.0
    # regression: must NOT update
    assert not mgr.save_best(3, _state(3), score=-1.0)
    got = mgr.restore_best(_state(0))
    assert float(got["w"][0]) == 2.0
    # improvement: updates
    assert mgr.save_best(4, _state(4), score=0.5)
    got = mgr.restore_best(_state(0))
    assert float(got["w"][0]) == 4.0


def test_best_gate_lower_is_better(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.save_best(1, _state(1), score=5.0, higher_is_better=False)
    assert mgr.save_best(2, _state(2), score=4.0, higher_is_better=False)
    assert not mgr.save_best(3, _state(3), score=4.5,
                             higher_is_better=False)
    got = mgr.restore_best(_state(0))
    assert float(got["w"][0]) == 2.0


def test_best_score_persists_across_instances(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_best(1, _state(1), score=0.7)
    mgr2 = CheckpointManager(str(tmp_path))
    assert mgr2.best_score == 0.7
    assert not mgr2.save_best(2, _state(2), score=0.3)

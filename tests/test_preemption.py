"""Preemption-safe training: SIGTERM → checkpoint → clean exit, and
the resulting checkpoint resumes exactly (composes with the exact
mid-epoch resume)."""

import os
import signal

import numpy as np
import pytest

from ekaid_tpu.config import default_config
from ekaid_tpu.train.train import build_synthetic_trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = default_config()
    cfg = cfg.replace(
        change_detector=cfg.change_detector.replace(
            att_dim=32, att_head=4, dim=8, pos_emb_dim=16),
        speaker=cfg.speaker.replace(
            input_dim=32, rnn_size=16, embed_input_dim=96, embed_dim=32,
            word_embed_size=8, seq_length=8),
        data=cfg.data.replace(num_nodes=6, feature_dim=24, adj_pad=10,
                              # divisible by the 8-virtual-device mesh
                              train=cfg.data.train.replace(batch_size=8),
                              test=cfg.data.test.replace(batch_size=8)),
        question=cfg.question.replace(hidden_dim=32),
        train=cfg.train.replace(max_iter=5, snapshot_interval=10 ** 9,
                                log_interval=10 ** 9))
    return build_synthetic_trainer(
        cfg, str(tmp_path_factory.mktemp("preempt")), n_pairs=16)


def test_stop_requested_checkpoints_and_returns(trainer):
    trainer.stop_requested = True
    trainer.train()
    # no step ran; a resumable checkpoint exists at the current step
    assert trainer.ckpt.latest_step() == int(trainer.state.step)
    trainer.stop_requested = False


def test_signal_handler_sets_flag_then_escalates(trainer):
    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        trainer.stop_requested = False
        trainer.install_preemption_handler()
        os.kill(os.getpid(), signal.SIGTERM)
        assert trainer.stop_requested
        with pytest.raises(KeyboardInterrupt):   # second signal
            os.kill(os.getpid(), signal.SIGTERM)
    finally:
        trainer.stop_requested = False
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def test_preempted_checkpoint_resumes_training(trainer):
    """Preempt MID-RUN (the signal arrives between steps 3 and 4 of a
    5-step run): the loop saves a checkpoint at the exact step, exits,
    and a restore + train() continues to max_iter."""
    from ekaid_tpu.utils.checkpoint import abstract_like
    real_make = trainer.make_train

    def make_with_preempt(ss_prob):
        fn = real_make(ss_prob)

        def stepper(state, batch, rng):
            out_state, metrics = fn(state, batch, rng)
            if int(out_state.step) == 3:        # "SIGTERM" after step 3
                trainer.stop_requested = True
            return out_state, metrics

        return stepper

    trainer.make_train = make_with_preempt
    try:
        trainer.train()                         # preempted: saves @3
    finally:
        trainer.make_train = real_make
        trainer.stop_requested = False
    assert int(trainer.state.step) == 3
    assert trainer.ckpt.latest_step() == 3
    restored = trainer.ckpt.restore(abstract_like(trainer.state))
    assert int(restored.step) == 3
    trainer.state = restored
    trainer.train()                             # resumes 3 → max_iter
    assert int(trainer.state.step) == 5

"""End-to-end quality canary regression (VERDICT r2 item 9): the FULL
text->speech pipeline (text -> TextToSemantic -> semantic ids -> CFM ->
log-mel latents), overfit on a tiny synthetic corpus, must land materially
closer to ground truth than chance on the north-star metric (mel-spectral
distance). `benchmarks/e2e_quality_canary.py` is the full-strength run whose
numbers are recorded in PERFORMANCE.md; this is a shortened gate."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def canary():
    from benchmarks.e2e_quality_canary import build_and_train, sample_from_text

    # 600 cfm steps is the measured minimum where the conditioning-used gate
    # holds (own-utterance 69.9 < cross-utterance 87.7 dB/frame); the
    # benchmark's full budget (2000) reaches 48.5
    pipe, gt = build_and_train(tts_steps=250, cfm_steps=600,
                               verbose=lambda *a: None)
    gen = sample_from_text(pipe, steps=12)
    return pipe, gt, gen


def test_trained_pipeline_beats_chance(canary):
    from benchmarks.e2e_quality_canary import mel_msd, sample_from_text

    pipe, gt, gen = canary
    msd = mel_msd(gen, gt)
    untrained = pipe["cfm"].init_params(
        jax.random.PRNGKey(99), seq_len=pipe["n_frames"], batch=1
    )
    msd0 = mel_msd(sample_from_text(pipe, params=untrained, steps=12), gt)
    assert np.isfinite(msd) and np.isfinite(msd0)
    assert msd < 0.5 * msd0, (
        f"trained MSD {msd:.1f} not materially below untrained {msd0:.1f}"
    )


def test_conditioning_is_used(canary):
    """Generated utterance i must be closer to ITS ground truth than the
    corpus's cross-utterance spread — i.e. the text actually conditions."""
    import jax.numpy as jnp

    from benchmarks.e2e_quality_canary import mel_msd

    pipe, gt, gen = canary
    own = mel_msd(gen, gt)
    cross = mel_msd(gt, jnp.asarray(np.roll(np.asarray(gt), 1, axis=0)))
    assert own < cross, (
        f"own-utterance MSD {own:.1f} >= cross-utterance {cross:.1f}: "
        "samples ignore their conditioning"
    )


class TestGeneralization:
    """VERDICT r4 missing #2: the overfit canaries sample the SAME texts
    they trained on; this gate holds the trained-vs-chance margin on texts
    the model NEVER saw (k-means vocabulary, seq2seq, and CFM all fit on the
    train split only). `benchmarks/e2e_generalization_canary.py` is the
    full-strength run whose numbers live in PERFORMANCE.md; this is a
    shortened split."""

    @pytest.fixture(scope="class")
    def gcanary(self):
        from benchmarks.e2e_generalization_canary import (
            build_and_train_gen,
            sample_texts,
        )

        pipe, train_texts, held_texts, gt_tr, gt_he = build_and_train_gen(
            n_train=16, n_held=4, tts_steps=600, cfm_steps=900,
            verbose=lambda *a: None,
        )
        gen_he = sample_texts(pipe, held_texts, steps=12)
        # cfm.init_params MUTATES cfm.params (the untrained-anchor draw
        # below would otherwise leave the shared pipe untrained for later
        # tests) — keep the trained tree to restore/pass explicitly
        pipe["trained_params"] = pipe["cfm"].params
        return pipe, held_texts, gt_he, gen_he

    def test_heldout_beats_chance(self, gcanary):
        from benchmarks.e2e_quality_canary import mel_msd
        from benchmarks.e2e_generalization_canary import sample_texts

        pipe, held_texts, gt_he, gen_he = gcanary
        msd = mel_msd(gen_he, gt_he)
        untrained = pipe["cfm"].init_params(
            jax.random.PRNGKey(99), seq_len=pipe["n_frames"], batch=1
        )
        msd0 = mel_msd(
            sample_texts(pipe, held_texts, params=untrained, steps=12), gt_he
        )
        assert np.isfinite(msd) and np.isfinite(msd0)
        assert msd < 0.5 * msd0, (
            f"held-out MSD {msd:.1f} not materially below untrained {msd0:.1f}"
        )

    def test_heldout_oracle_ids_beat_chance(self, gcanary):
        """The CFM alone must generalize to UNSEEN id sequences: samples
        conditioned on the held-out utterances' ground-truth semantic ids
        must beat chance by the same 2x margin. (The stricter own < cross
        conditioning margin needs the full benchmark budget — measured
        78.1 < 97.5 dB/frame at 24 train / 1000+2000 steps, PERFORMANCE.md —
        and is deliberately NOT gated at this shortened budget, where it
        sits at the noise floor: 80.2 vs 79.5.)"""
        from benchmarks.e2e_quality_canary import mel_msd
        from benchmarks.e2e_generalization_canary import sample_oracle_ids

        pipe, held_texts, gt_he, gen_he = gcanary
        oracle = mel_msd(
            sample_oracle_ids(pipe, pipe["sem_held"], steps=12,
                              params=pipe["trained_params"]),
            gt_he,
        )
        untrained = pipe["cfm"].init_params(
            jax.random.PRNGKey(98), seq_len=pipe["n_frames"], batch=1
        )
        oracle0 = mel_msd(
            sample_oracle_ids(pipe, pipe["sem_held"], params=untrained,
                              steps=12),
            gt_he,
        )
        assert np.isfinite(oracle) and np.isfinite(oracle0)
        assert oracle < 0.5 * oracle0, (
            f"held-out oracle-id MSD {oracle:.1f} not materially below "
            f"untrained {oracle0:.1f}"
        )


class TestDurationPipeline:
    """Same gates for BASELINE config 4's pipeline (VERDICT r3 item 5):
    text -> DurationPredictor (aligner + MAS) -> aligned ids -> CFM ->
    log-mel latents, sampled through cfm.sample's duration branch."""

    @pytest.fixture(scope="class")
    def dcanary(self):
        from benchmarks.e2e_quality_canary_duration import (
            build_and_train_duration,
            sample_from_text_duration,
        )

        # measured gate minimum: dp 300 / cfm 700 gives own 80.3 <
        # cross 87.7; 800 adds margin. The benchmark's full budget (2000)
        # goes well below.
        pipe, gt = build_and_train_duration(dp_steps=300, cfm_steps=800,
                                            verbose=lambda *a: None)
        gen = sample_from_text_duration(pipe, steps=12)
        return pipe, gt, gen

    def test_trained_beats_chance(self, dcanary):
        from benchmarks.e2e_quality_canary import mel_msd
        from benchmarks.e2e_quality_canary_duration import (
            sample_from_text_duration,
        )

        pipe, gt, gen = dcanary
        msd = mel_msd(gen, gt)
        untrained = pipe["cfm"].init_params(
            jax.random.PRNGKey(99), seq_len=pipe["n_frames"], batch=1
        )
        msd0 = mel_msd(
            sample_from_text_duration(pipe, params=untrained, steps=12), gt
        )
        assert np.isfinite(msd) and np.isfinite(msd0)
        assert msd < 0.5 * msd0, (
            f"trained MSD {msd:.1f} not materially below untrained {msd0:.1f}"
        )

    def test_conditioning_is_used(self, dcanary):
        import jax.numpy as jnp

        from benchmarks.e2e_quality_canary import mel_msd

        pipe, gt, gen = dcanary
        own = mel_msd(gen, gt)
        cross = mel_msd(gt, jnp.asarray(np.roll(np.asarray(gt), 1, axis=0)))
        assert own < cross, (
            f"own-utterance MSD {own:.1f} >= cross-utterance {cross:.1f}: "
            "the duration-aligned ids don't condition the samples"
        )

"""Metrics tests: similarity math, vectorized==scalar, calculators, aggregation."""

from fractions import Fraction

import numpy as np
import pytest

from ai_music_generation_tpu.codec.score import Measure, NoteEl, Part, Score, TimeSig
from ai_music_generation_tpu.eval.calculate import (
    aggregate_similarity_results,
    calculate_conditioned_similarity_of_music_vectors,
    calculate_inner_similarity_of_music_vectors,
    calculate_reference_similarity_of_music_vectors,
)
from ai_music_generation_tpu.eval.similarities import (
    cyclic_pitch_similarity,
    cyclic_pitch_similarity_matrix,
    offsets_to_histogram,
    rhythmic_similarity,
    rhythmic_similarity_matrix,
)
from ai_music_generation_tpu.eval.vectorization import MidiVectorizer

F = Fraction


# ---- similarity functions ---------------------------------------------------

def test_cyclic_pitch_identity():
    v = [1.0, 0, 0.5, 0, 0, 0.25, 0, 0, 0, 0, 0, 0]
    assert cyclic_pitch_similarity(v, v) == pytest.approx(1.0)


def test_cyclic_pitch_transposition_invariance():
    v = [1.0, 0, 0.5, 0, 0, 0.25, 0, 0, 0, 0, 0, 0]
    shifted = v[5:] + v[:5]
    assert cyclic_pitch_similarity(v, shifted) == pytest.approx(1.0)


def test_cyclic_pitch_zero_convention():
    # both-zero bins count as term=1
    a = [1.0] + [0.0] * 11
    b = [1.0] + [0.0] * 11
    assert cyclic_pitch_similarity(a, b) == pytest.approx(1.0)
    c = [0.0] * 12
    # all-zero vs nonzero: 11 bins agree-as-zero per best shift
    assert cyclic_pitch_similarity(a, c) == pytest.approx(11 / 12)


def test_cyclic_pitch_length_check():
    with pytest.raises(ValueError):
        cyclic_pitch_similarity([0.0] * 11, [0.0] * 12)


def test_rhythmic_similarity_multiset():
    assert rhythmic_similarity([0, 1, 2], [0, 1, 2]) == pytest.approx(1.0)
    assert rhythmic_similarity([0, 0, 1], [0, 1, 1]) == pytest.approx(4 / 6)
    assert rhythmic_similarity([], []) == 1.0
    assert rhythmic_similarity([0], []) == 0.0
    # Fractions and equal floats unify like the reference Counter
    assert rhythmic_similarity([F(1, 2)], [0.5]) == pytest.approx(1.0)


def test_matrix_matches_scalar():
    rng = np.random.default_rng(0)
    A = rng.random((5, 12))
    B = rng.random((4, 12))
    A[0, :6] = 0
    B[0, :6] = 0
    M = cyclic_pitch_similarity_matrix(A, B)
    for i in range(5):
        for j in range(4):
            assert M[i, j] == pytest.approx(
                cyclic_pitch_similarity(list(A[i]), list(B[j])), abs=1e-12
            )


def test_rhythmic_matrix_matches_scalar():
    sets = [[0, 1, 2, 2.5], [0, 2], [], [0.5, 1.5, 2.5]]
    H = np.stack([offsets_to_histogram(s) for s in sets])
    M = rhythmic_similarity_matrix(H, H)
    for i, si in enumerate(sets):
        for j, sj in enumerate(sets):
            assert M[i, j] == pytest.approx(rhythmic_similarity(si, sj))


# ---- vectorizer -------------------------------------------------------------

def two_part_score():
    p0 = Part(measures=[
        Measure(time_sig=TimeSig(4, 4), notes=[
            NoteEl(F(0), F(2), (60,)), NoteEl(F(2), F(2), (64, 67)),
        ]),
        Measure(notes=[NoteEl(F(0), F(4), (72,))]),
    ])
    p1 = Part(measures=[
        Measure(time_sig=TimeSig(4, 4), notes=[NoteEl(F(0), F(4), (48,))]),
    ])
    return Score([p0, p1])


def test_vectorizer_distributions_and_offsets():
    vec = MidiVectorizer()
    dists, offsets = vec.midi_or_score_to_notes_and_offsets_feature_vectors(
        two_part_score()
    )
    assert len(dists) == 2  # padded to longest part
    # measure 0: C(60)=2q, E(64)=2q, G(67)=2q, C(48)=4q -> pc0: 6/4, pc4: 2/4, pc7: 2/4
    assert dists[0][0] == pytest.approx(6 / 4)
    assert dists[0][4] == pytest.approx(2 / 4)
    assert dists[0][7] == pytest.approx(2 / 4)
    # chord contributes one offset PER PITCH (ref :76-80)
    assert sorted(float(o) for o in offsets[0]) == [0.0, 0.0, 2.0, 2.0]
    # measure 1: only part 0 has content; part 1 padded empty
    assert dists[1][0] == pytest.approx(1.0)
    assert offsets[1] == [0]


def test_vectorizer_normalize_by_n_parts():
    vec = MidiVectorizer()
    d1, _ = vec.midi_or_score_to_notes_and_offsets_feature_vectors(
        two_part_score(), normalize_by_n_parts=True
    )
    d2, _ = vec.midi_or_score_to_notes_and_offsets_feature_vectors(two_part_score())
    assert d1[0][0] == pytest.approx(d2[0][0] / 2)


# ---- calculators ------------------------------------------------------------

VECS = [
    [1.0] + [0.0] * 11,
    [0.0, 1.0] + [0.0] * 10,  # transposition of VECS[0] -> sim 1.0
    [0.5] * 12,
]


def test_inner_similarity():
    r = calculate_inner_similarity_of_music_vectors(VECS, cyclic_pitch_similarity)
    assert len(r.similarity_matrix) == 3
    assert r.similarity_matrix[0][1] == pytest.approx(1.0)
    assert r.best_matches[0][0] == pytest.approx(1.0)
    assert 1 in r.best_matches[0][1]
    assert 0 < r.mean_best_similarities <= 1


def test_inner_similarity_matrix_fn_path():
    r1 = calculate_inner_similarity_of_music_vectors(VECS, cyclic_pitch_similarity)
    r2 = calculate_inner_similarity_of_music_vectors(
        VECS, matrix_fn=cyclic_pitch_similarity_matrix
    )
    np.testing.assert_allclose(r1.similarity_matrix, r2.similarity_matrix, atol=1e-12)
    assert r1.mean_best_similarities == pytest.approx(r2.mean_best_similarities)


def test_reference_similarity_with_skip():
    src = VECS + [[0.25] * 12]
    ref = VECS
    r = calculate_reference_similarity_of_music_vectors(
        src, ref, cyclic_pitch_similarity, n_measures_to_skip=1
    )
    assert len(r.similarity_matrix) == 3
    assert len(r.similarity_matrix[0]) == 2


def test_conditioned_similarity():
    r = calculate_conditioned_similarity_of_music_vectors(
        VECS, 2, cyclic_pitch_similarity
    )
    # N x k matrix
    assert len(r.similarity_matrix) == 3
    assert len(r.similarity_matrix[0]) == 2
    # best matches only for i >= k
    assert len(r.best_matches) == 1
    with pytest.raises(ValueError):
        calculate_conditioned_similarity_of_music_vectors(VECS, 0, cyclic_pitch_similarity)


def test_best_match_modes():
    vecs = [[1.0] + [0.0] * 11, [0.0, 1.0] + [0.0] * 10, [0.0, 0.0, 1.0] + [0.0] * 9]
    r_all = calculate_inner_similarity_of_music_vectors(vecs, cyclic_pitch_similarity, "all")
    r_first = calculate_inner_similarity_of_music_vectors(vecs, cyclic_pitch_similarity, "first")
    r_closest = calculate_inner_similarity_of_music_vectors(vecs, cyclic_pitch_similarity, "closest")
    assert len(r_all.best_matches[0][1]) == 2  # both are perfect transpositions
    assert len(r_first.best_matches[0][1]) == 1
    assert r_closest.best_matches[0][2] == [1]  # distance-1 match kept


def test_aggregate():
    r1 = calculate_inner_similarity_of_music_vectors(VECS, cyclic_pitch_similarity)
    r2 = calculate_inner_similarity_of_music_vectors(VECS[:2], cyclic_pitch_similarity)
    agg = aggregate_similarity_results([r1, r2])
    assert len(agg.similarity_matrix) == 3
    assert len(agg.best_matches) == len(r1.best_matches) + len(r2.best_matches)
    assert aggregate_similarity_results([]).mean_best_similarities == 0.0
    # overlap cell is the mean of both; non-overlap keeps r1's value
    assert agg.similarity_matrix[0][1] == pytest.approx(
        (r1.similarity_matrix[0][1] + r2.similarity_matrix[0][1]) / 2
    )
    assert agg.similarity_matrix[2][2] == pytest.approx(r1.similarity_matrix[2][2])


def test_plotting_smoke(tmp_path):
    from ai_music_generation_tpu.eval.plotting import (
        plot_distribution_of_best_match_measure_distances,
        plot_distribution_of_best_similarities,
        plot_similarity_matrix,
    )

    r = calculate_inner_similarity_of_music_vectors(VECS, cyclic_pitch_similarity)
    plot_similarity_matrix(r, save_path=str(tmp_path / "m.png"))
    plot_distribution_of_best_similarities(r, save_path=str(tmp_path / "b.png"))
    plot_distribution_of_best_match_measure_distances(r, save_path=str(tmp_path / "d.png"))
    assert (tmp_path / "m.png").exists()

"""BIDS → cache ingestion arithmetic (scripts/build_gwilliams_cache.py),
exercised on synthetic annotation DataFrames — no mne_bids required.

Covers the reference semantics of gwilliams2022.py: the multi-wav onset
continuation (``continuous``, :669-688), word-vs-phoneme filtering
(``get_speech_onsets``, :701-721), to_second timestamp conversion (:665-666),
and the cross-subject onset/sentence consistency asserts (:240-244).
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from build_gwilliams_cache import (  # noqa: E402
    _extract_annotations,
    accumulate_session,
    continuous_onsets,
    to_second,
)


def _annot_df(entries, onsets_sec):
    """Synthetic BIDS annotations DataFrame: ``description`` is a stringified
    dict per annotation (the BIDS convention the reference eval()s),
    ``onset`` a Timestamp."""
    desc = [str({"start": s, "kind": k, "sequence_id": q})
            for (s, k, q) in entries]
    onset = [pd.Timestamp(2020, 1, 1) + pd.Timedelta(seconds=float(t))
             for t in onsets_sec]
    return pd.DataFrame({"description": desc, "onset": onset})


class TestContinuousOnsets:
    def test_single_file_unchanged(self):
        s = np.array([0.1, 0.5, 2.0, 7.25])
        np.testing.assert_allclose(continuous_onsets(s), s)

    def test_multi_file_bumps_accumulate(self):
        # three audio files: resets to ~0 mark file boundaries; each new
        # file's onsets are shifted by the previous file's LAST timestamp
        s = np.array([0.0, 4.0, 9.5,    # file 1 (ends 9.5)
                      0.2, 3.0,         # file 2 (ends 3.0; base 9.5)
                      0.1, 1.0])        # file 3 (base 9.5+3.0)
        expect = np.array([0.0, 4.0, 9.5, 9.7, 12.5, 12.6, 13.5])
        np.testing.assert_allclose(continuous_onsets(s), expect)

    def test_equal_adjacent_onsets_do_not_bump(self):
        # next < current triggers a bump; equal onsets (a word and its first
        # phoneme share a start) must NOT
        s = np.array([0.5, 0.5, 1.0, 1.0, 2.0])
        np.testing.assert_allclose(continuous_onsets(s), s)


class TestToSecond:
    def test_minute_second_microsecond(self):
        t = pd.Timestamp("2020-01-01 00:12:34.250")
        assert to_second(t) == pytest.approx(12 * 60 + 34 + 0.25)

    def test_hours_dropped_reference_semantics(self):
        # the reference's to_second ignores .hour (gwilliams2022.py:665-666);
        # kept faithfully — recordings are < 1 h
        t = pd.Timestamp(2020, 1, 1, 1, 2, 3)
        assert to_second(t) == pytest.approx(2 * 60 + 3)


class TestExtractAnnotations:
    def test_word_filtering_and_continuation(self):
        # phonemes interleaved with words, second wav file starting at 0.05
        entries = [
            (0.0, "phoneme", 0), (0.0, "word", 0), (1.2, "phoneme", 0),
            (2.5, "word", 1), (8.0, "word", 1),     # file 1 ends at 8.0
            (0.05, "word", 2), (0.9, "phoneme", 2), (1.5, "word", 3),
        ]
        meg_t = [10.0, 10.0, 11.2, 12.5, 18.0, 18.1, 18.9, 19.5]
        df = _annot_df(entries, meg_t)
        word_idx, sp_on, sent, meg_on = _extract_annotations(df)
        np.testing.assert_array_equal(word_idx, [1, 3, 4, 5, 7])
        np.testing.assert_allclose(sp_on, [0.0, 2.5, 8.0, 8.05, 9.5])
        np.testing.assert_array_equal(sent, [0, 1, 1, 2, 3])
        np.testing.assert_allclose(meg_on, [10.0, 12.5, 18.0, 18.1, 19.5])

    def test_continuation_uses_all_annotations_before_word_filter(self):
        # the file-boundary reset can land on a PHONEME row; the reference
        # accumulates over every annotation, then filters — so must we
        entries = [
            (5.0, "word", 0),
            (6.0, "phoneme", 0),   # file 1's last timestamp
            (0.5, "phoneme", 1),   # file 2 starts (reset seen phoneme→phoneme)
            (1.0, "word", 1),
        ]
        df = _annot_df(entries, [0.0, 1.0, 2.0, 3.0])
        _, sp_on, _, _ = _extract_annotations(df)
        np.testing.assert_allclose(sp_on, [5.0, 7.0])  # 1.0 + base 6.0


class TestCrossSubjectConsistency:
    def _acc(self):
        return {"meg_onsets": {}, "speech_onsets": {}, "sentence_idxs": {}}

    def test_accumulates_reference_format_keys(self):
        entries = [(0.0, "word", 0), (1.0, "word", 1)]
        acc = self._acc()
        k1 = accumulate_session(acc, 0, 0, 2, _annot_df(entries, [3.0, 4.0]))
        k2 = accumulate_session(acc, 4, 1, 2, _annot_df(entries, [5.0, 6.0]))
        assert k1 == "subject01_sess0_task2"
        assert k2 == "subject05_sess1_task2"
        assert set(acc["meg_onsets"]) == {k1, k2}
        assert set(acc["speech_onsets"]) == {"task2"}
        # meg onsets differ per session, speech onsets shared per task
        np.testing.assert_allclose(acc["meg_onsets"][k1], [3.0, 4.0])
        np.testing.assert_allclose(acc["meg_onsets"][k2], [5.0, 6.0])

    def test_mismatched_speech_onsets_raise(self):
        acc = self._acc()
        accumulate_session(acc, 0, 0, 0,
                           _annot_df([(0.0, "word", 0)], [1.0]))
        with pytest.raises(AssertionError, match="Speech onsets"):
            accumulate_session(acc, 1, 0, 0,
                               _annot_df([(0.7, "word", 0)], [1.0]))

    def test_mismatched_sentence_ids_raise(self):
        acc = self._acc()
        accumulate_session(acc, 0, 0, 0,
                           _annot_df([(0.0, "word", 0)], [1.0]))
        with pytest.raises(AssertionError, match="Sentence ids"):
            accumulate_session(acc, 1, 0, 0,
                               _annot_df([(0.0, "word", 3)], [1.0]))

    def test_different_tasks_do_not_cross_check(self):
        acc = self._acc()
        accumulate_session(acc, 0, 0, 0, _annot_df([(0.0, "word", 0)], [1.0]))
        # different onsets under a different task id: fine
        accumulate_session(acc, 0, 0, 1, _annot_df([(0.9, "word", 5)], [2.0]))
        assert set(acc["speech_onsets"]) == {"task0", "task1"}

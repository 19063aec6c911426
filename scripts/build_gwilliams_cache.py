"""Build the Gwilliams2022 preprocessed cache from raw BIDS + stimulus audio.

Reference: ``gwilliams2022.py:193-388`` — a 20-process MNE pool filters and
resamples 27×2×4 subject-session-task recordings (~30 min on 20 cores,
README.md:26) and a torch wav2vec pass embeds the stimulus audio.

TPU-native split of labor:
* host: BIDS parsing + annotation extraction (needs ``mne_bids`` — install it
  where you build the cache; this zero-egress image doesn't ship it);
* device: the whole filter+resample chain as ONE batched XLA program over
  all recordings (``ops/fir.py`` + ``ops/resample.py``), sharded over the
  mesh when more than one chip is attached;
* device: wav2vec2 embedding of the stimulus audio (``features/wav2vec.py``).

Output: the reference-compatible cache layout
(``x_dict.npy``/``y_dict.npy``/``meg_onsets.npy``/``speech_onsets.npy``/
``sentence_idxs.npy`` under ``data/Gwilliams2022/preprocessed/<n>/``), so
caches built here load in either implementation.

    python scripts/build_gwilliams_cache.py --config-name config root_dir=...
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meg_decoding_tpu.cli.main import parse_cli
from meg_decoding_tpu.data.gwilliams import preprocess_recordings
from meg_decoding_tpu.utils.cache import check_preprocs, mark_done

NUM_SUBJECTS = 27
NUM_SESSIONS = 2
NUM_TASKS = 4
TASK_PREFIXES = ["lw", "cable", "easy", "the"]  # gwilliams2022.py:72


def to_second(onset) -> float:
    """Timestamp → seconds, reference semantics (to_second,
    gwilliams2022.py:665-666: minute·60 + second + µs — hours are NOT
    included, recordings being < 1 h)."""
    return onset.minute * 60 + onset.second + onset.microsecond * 1e-6


def continuous_onsets(starts: np.ndarray) -> np.ndarray:
    """Make per-audio-file onsets continuous across the concatenated files
    (reference ``continuous``, gwilliams2022.py:669-688): whenever the next
    raw onset is smaller than the current one, a new file started — bump the
    base by the current file's last timestamp."""
    starts = np.asarray(starts, dtype=float)
    out = starts.copy()
    base = 0.0
    for i in range(len(out)):
        bump = i < len(out) - 1 and starts[i + 1] < starts[i]
        if bump:
            nxt = base + starts[i]
        out[i] = starts[i] + base
        if bump:
            base = nxt
    return out


def _extract_annotations(df_annot):
    """word onsets / sentence ids from BIDS annotations
    (reference get_speech_onsets, gwilliams2022.py:701-721): onsets are made
    continuous over ALL annotations (words + phonemes) first, THEN filtered
    to kind == 'word', exactly as the reference does."""
    import pandas as pd

    desc = pd.DataFrame(df_annot.description.apply(eval).to_list())
    out = continuous_onsets(desc["start"].to_numpy())
    kinds = desc["kind"].to_numpy()
    word_idx = np.where(kinds == "word")[0]
    meg_onsets = np.array([to_second(o) for o in df_annot.onset])[word_idx]
    return word_idx, out[word_idx], desc["sequence_id"].to_numpy()[word_idx], meg_onsets


def accumulate_session(acc: dict, subj: int, sess: int, task: int, df_annot):
    """Fold one session's annotations into the cache dicts, with the
    reference's cross-subject/session consistency asserts
    (gwilliams2022.py:240-244: speech onsets and sentence ids must be
    identical across every subject/session of a task).

    ``acc`` maps 'meg_onsets'/'speech_onsets'/'sentence_idxs' → dict.
    Returns the x_dict key for this session.
    """
    word_idx, sp_on, sent, meg_on = _extract_annotations(df_annot)
    key = f"subject{subj + 1:02d}_sess{sess}_task{task}"
    task_key = f"task{task}"
    if task_key in acc["speech_onsets"]:
        assert np.allclose(acc["speech_onsets"][task_key], sp_on), \
            "Speech onsets are different"
        assert np.array_equal(acc["sentence_idxs"][task_key], sent), \
            "Sentence ids are different"
    acc["speech_onsets"][task_key] = sp_on
    acc["sentence_idxs"][task_key] = sent
    acc["meg_onsets"][key] = meg_on
    return key


def extract_layout(info, n_channels: int = 208) -> np.ndarray:
    """2-D sensor layout from a recording's measurement info, exactly as the
    reference builds it at model-construction time
    (``layout.py:30-32``: ``find_layout(raw.info, 'meg').pos[:, :2]``),
    sliced to the same leading ``n_channels`` the MEG data keeps.

    Extracted once at CACHE-BUILD time and stored as ``layout.npy`` beside
    ``x_dict.npy`` so training machines need no MNE — ``ch_locations_2d``
    prefers a cache-resident layout over the synthetic fallback."""
    import mne

    layout = mne.channels.find_layout(info, ch_type="meg")
    return np.asarray(layout.pos[:n_channels, :2], dtype=np.float32)


def build_x(cfg, cache_dir):
    try:
        import mne
        import mne_bids
    except ImportError as e:
        raise SystemExit(
            "mne_bids is required to parse the raw BIDS recordings (not in "
            "this image). Build the cache on a host with mne_bids installed, "
            "or provide a prepared cache (data/gwilliams.py docstring)."
        ) from e

    from meg_decoding_tpu.ops.resample import resample_len

    pre = cfg.preprocs
    root = os.path.join(cfg.root_dir, "data", "Gwilliams2022")
    x_dict = {}
    layout = None
    acc = {"meg_onsets": {}, "speech_onsets": {}, "sentence_idxs": {}}
    # STREAM one recording at a time: each raw is ~650 MB as f64 and there
    # are up to 216 of them — accumulating all raws then batching (the
    # reference pads them into one array too) needs hundreds of GB.  Per-
    # recording processing also keeps the FFT resample exact (resampling a
    # recording zero-padded to the longest length then slicing is NOT the
    # same signal), and the output length follows resample_len's round()
    # (MNE semantics) instead of a float truncation.
    for subj in range(NUM_SUBJECTS):
        for sess in range(NUM_SESSIONS):
            for task in range(NUM_TASKS):
                bids_path = mne_bids.BIDSPath(
                    subject=str(subj + 1).zfill(2), session=str(sess),
                    task=str(task), datatype="meg", root=root,
                )
                try:
                    raw = mne_bids.read_raw_bids(bids_path)
                except Exception:
                    continue
                if layout is None:
                    # the reference reads the layout from the FIRST BIDS
                    # recording (layout.py:20-32); same here, persisted into
                    # the cache so no MNE is needed at train time
                    layout = extract_layout(raw.info)
                df = raw.to_data_frame()
                key = accumulate_session(acc, subj, sess, task,
                                         raw.annotations.to_data_frame())
                meg = np.stack(
                    [df[k] for k in df.keys() if "MEG" in k]
                )[:208].astype(np.float32)
                del raw, df
                out = preprocess_recordings(
                    meg[None], 1000.0, float(pre.brain_filter_low),
                    float(pre.brain_filter_high),
                    float(pre.brain_resample_rate))
                n_out = resample_len(meg.shape[1],
                                     down=1000.0 / float(pre.brain_resample_rate))
                x_dict[key] = np.asarray(out[0, :, :n_out])
    meg_onsets, speech_onsets, sentence_idxs = (
        acc["meg_onsets"], acc["speech_onsets"], acc["sentence_idxs"])

    if layout is not None:
        np.save(os.path.join(cache_dir, "layout.npy"), layout)
    # small metadata sidecar so metadata-only consumers (cli/export_model)
    # never have to load the multi-GB x_dict just for the channel count
    # (layout.npy rows are NOT a substitute: KIT layouts can carry more
    # positions than recorded channels)
    import json as _json

    if x_dict:  # an empty build writes no sidecar (0 would be a lie)
        C_data = int(next(iter(x_dict.values())).shape[0])
        with open(os.path.join(cache_dir, "meta.json"), "w") as f:
            _json.dump({"num_channels": C_data}, f)
    np.save(os.path.join(cache_dir, "x_dict.npy"), x_dict, allow_pickle=True)
    np.save(os.path.join(cache_dir, "meg_onsets.npy"), meg_onsets, allow_pickle=True)
    np.save(os.path.join(cache_dir, "speech_onsets.npy"), speech_onsets,
            allow_pickle=True)
    np.save(os.path.join(cache_dir, "sentence_idxs.npy"), sentence_idxs,
            allow_pickle=True)
    mark_done(cache_dir, "x_done")


def build_y(cfg, cache_dir):
    import glob

    from scipy.io import wavfile

    import jax.numpy as jnp

    from meg_decoding_tpu.features.wav2vec import embed_last4_avg, load_wav2vec
    from meg_decoding_tpu.ops.resample import resample_fft

    pre = cfg.preprocs
    audio_dir = os.path.join(cfg.root_dir, "data", "Gwilliams2022", "stimuli",
                             "audio")
    # default 'hf': a cache built from randomly initialized embeddings would
    # be silently garbage and permanently marked y_done
    model, params = load_wav2vec(
        cfg.get("wav2vec_model") or "facebook/wav2vec2-large-xlsr-53",
        backend=cfg.get("wav2vec_backend", "hf"))
    target = int(pre.audio_resample_rate)
    y_dict = {}
    for t, prefix in enumerate(TASK_PREFIXES):
        paths = sorted(glob.glob(os.path.join(audio_dir, f"{prefix}*.wav")))
        assert paths, f"no audio for task {t} under {audio_dir}"
        chunks = []
        for p in paths:
            sr, w = wavfile.read(p)
            if w.dtype.kind == "i":
                w = w / np.iinfo(w.dtype).max
            w = np.asarray(w, np.float32).reshape(-1)
            if sr != target:
                w = np.asarray(resample_fft(jnp.asarray(w)[None],
                                            down=sr / target))[0]
            emb = embed_last4_avg(model, params, w)
            rate_w2v = target * emb.shape[-1] / len(w)
            emb = np.asarray(resample_fft(
                jnp.asarray(emb), up=float(pre.brain_resample_rate) / rate_w2v))
            chunks.append(emb)
        y_dict[f"task{t}"] = np.concatenate(chunks, axis=-1)
    np.save(os.path.join(cache_dir, "y_dict.npy"), y_dict, allow_pickle=True)
    mark_done(cache_dir, "y_done")


def main():
    cfg = parse_cli(default_config_name="config")
    base = os.path.join(cfg.root_dir, "data", "Gwilliams2022", "preprocessed")
    from meg_decoding_tpu.core.config import to_dict

    cache_dir, x_done, y_done = check_preprocs(to_dict(cfg.preprocs), base)
    print("cache dir:", cache_dir)
    if not x_done or cfg.get("rebuild_dataset", False):
        build_x(cfg, cache_dir)
    if not y_done or cfg.get("rebuild_dataset", False):
        build_y(cfg, cache_dir)
    print("done")


if __name__ == "__main__":
    main()

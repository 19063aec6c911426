"""Migrate a trained REFERENCE checkpoint (.pt) into this framework.

A reference user switching frameworks brings ``model_last.pt`` files saved
by ``torch.save(brain_encoder.state_dict(), ...)`` (reference train.py).
This converts one into a framework checkpoint (``save_root/ckpt/model_last``)
that the evaluators (``evaluate.py``), the serving exporter
(``meg-decode-export``), and resumed training all consume directly.

    python scripts/import_torch_checkpoint.py model_last.pt \
        --config-name config dataset=Gwilliams2022 save_root=runs_out \
        num_channels=208 num_subjects=27

Model dims come from the config exactly as at training time; the optimizer
state starts fresh (the reference checkpoint carries none) and the CLIP
temperature starts at ``init_temperature`` — pass the reference's trained
temperature via ``init_temperature=...`` if it was saved separately.

Checkpoints saved as whole pickled modules (``torch.save(model, ...)``)
need ``allow_pickle=true`` — unpickling executes code from the file, so
only pass it for files you trust.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(torch_ckpt: str, cfg) -> str:
    import jax
    import jax.numpy as jnp

    from meg_decoding_tpu.data.layout import ch_locations_2d
    from meg_decoding_tpu.models.factory import get_model
    from meg_decoding_tpu.train.checkpoint import CheckpointManager
    from meg_decoding_tpu.train.schedules import make_optimizer
    from meg_decoding_tpu.train.state import create_train_state
    from meg_decoding_tpu.utils.torch_import import (
        brain_encoder_from_state_dict,
        eegnet_from_state_dict,
        linear_encoder_from_state_dict,
        load_torch_checkpoint,
    )

    save_root = cfg.get("save_root", "runs_out")
    num_channels = int(cfg.get("num_channels", 208))
    cfg.num_channels = num_channels
    rate = float(cfg.preprocs.get("brain_resample_rate") or 120)
    seq_len = int(rate * float(cfg.preprocs.get("seq_len_sec", 3)))
    loc = ch_locations_2d(cfg)
    model = get_model(cfg, loc=loc, num_channels=num_channels)

    # --allow-pickle: a checkpoint holding a whole pickled nn.Module (the
    # torch.save(model, ...) form) needs full unpickling — opt-in only,
    # because unpickling executes code from the file
    sd = load_torch_checkpoint(
        torch_ckpt, allow_pickle=bool(cfg.get("allow_pickle", False)))
    name = cfg.get("model", "brain_encoder")
    if name == "linear":
        imported_params, imported_stats = linear_encoder_from_state_dict(sd)
    elif name.startswith("eegnet"):
        imported_params, imported_stats = eegnet_from_state_dict(sd)
    else:
        imported_params, imported_stats = brain_encoder_from_state_dict(sd)

    # abstract state for shapes/optimizer/PRNG; params then overwritten
    F = int(cfg.get("F", 1024))
    seq2seq = bool(cfg.get("seq2seq", True))
    X = jnp.zeros((2, num_channels, seq_len), jnp.float32)
    Y = jnp.zeros((2, F, seq_len) if seq2seq else (2, F), jnp.float32)
    subs = jnp.zeros((2,), jnp.int32)
    state = create_train_state(
        model, make_optimizer(cfg, int(cfg.get("updates", 1200))),
        (X, Y, subs), jax.random.PRNGKey(int(cfg.get("seed", 0))),
        init_temperature=float(cfg.get("init_temperature", 5.1)))

    # shape-check the imported tree against the abstract one before saving
    ref = jax.tree_util.tree_map(np.shape, state.params["model"])
    got = jax.tree_util.tree_map(np.shape, imported_params)
    assert ref == got, f"imported tree shape mismatch:\n{ref}\nvs\n{got}"
    state = state.replace(
        params={**state.params, "model": imported_params},
        batch_stats=imported_stats or state.batch_stats)

    ckpt = CheckpointManager(os.path.join(save_root, "ckpt"))
    ckpt.save("model_last", state)
    print(f"imported {torch_ckpt} -> {save_root}/ckpt/model_last "
          f"({name}; evaluate.py / meg-decode-export ready)")
    return os.path.join(save_root, "ckpt", "model_last")


def main(argv=None):
    from meg_decoding_tpu.cli.main import parse_cli_auto

    argv = list(sys.argv[1:] if argv is None else argv)
    # bare .pt/.pth tokens only — a key=value override whose VALUE ends in
    # .pt (e.g. y_embeds_path=embd.pt) is a config override, not a checkpoint
    ckpts = [a for a in argv if a.endswith((".pt", ".pth")) and "=" not in a]
    assert len(ckpts) == 1, "pass exactly one torch checkpoint (.pt/.pth)"
    rest = [a for a in argv if a not in ckpts]
    return run(ckpts[0], parse_cli_auto(rest))


if __name__ == "__main__":
    main()

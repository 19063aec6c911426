"""Host→device prefetch pipeline (data/prefetch.py) — the spill path
replacing the reference's DataLoader workers for datasets exceeding HBM."""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meg_decoding_tpu.data.prefetch import prefetch_to_device


class TestPrefetch:
    def test_yields_all_batches_in_order_on_device(self):
        batches = [dict(x=np.full((4, 3), i, np.float32), i=np.int32(i))
                   for i in range(7)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 7
        for i, b in enumerate(out):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
            assert int(b["i"]) == i

    def test_producer_exception_propagates(self):
        def gen():
            yield np.zeros(3)
            raise RuntimeError("bad shard")

        it = prefetch_to_device(gen(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="bad shard"):
            # the error may land on either of the remaining pulls
            next(it)
            next(it)

    def test_overlaps_host_production_with_consumption(self):
        """With size=2 the producer runs ahead: total wall time is close to
        max(produce, consume), not their sum."""
        delay = 0.05
        n = 8

        def gen():
            for i in range(n):
                time.sleep(delay)  # host-side gather cost
                yield np.full((2,), i, np.float32)

        t0 = time.time()
        for b in prefetch_to_device(gen(), size=2):
            time.sleep(delay)  # consumer step cost
        dt = time.time() - t0
        # serial would be ~2*n*delay = 0.8 s; overlapped ~ (n+1)*delay
        assert dt < 1.7 * n * delay, dt

    def test_custom_device_put_for_sharding(self):
        from meg_decoding_tpu.core.mesh import make_mesh, shard_batch

        mesh = make_mesh(n_data=4, devices=jax.devices("cpu")[:4])
        batches = [(np.arange(8, dtype=np.float32).reshape(8, 1),) for _ in range(3)]
        out = list(prefetch_to_device(iter(batches), size=2,
                                      device_put=lambda b: shard_batch(mesh, b)))
        for (x,) in out:
            assert len(x.addressable_shards) == 4
            assert x.addressable_shards[0].data.shape == (2, 1)

    def test_size_validation(self):
        with pytest.raises(ValueError):
            list(prefetch_to_device(iter([]), size=0))

    def test_abandoned_iterator_stops_worker(self):
        """Breaking out mid-epoch must release the worker thread (it would
        otherwise block on the full queue forever, pinning `size` batches)."""
        import threading

        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield np.full((4,), i, np.float32)

        before = {t.ident for t in threading.enumerate()}
        it = prefetch_to_device(gen(), size=2)
        next(it)
        it.close()  # the consumer abandons the epoch (GeneratorExit)
        # the worker must exit promptly instead of blocking on q.put
        deadline = time.time() + 5.0
        while time.time() < deadline:
            extra = [t for t in threading.enumerate()
                     if t.ident not in before and t.is_alive()]
            if not extra:
                break
            time.sleep(0.05)
        assert not extra, "prefetch worker still alive after iterator close"
        assert len(produced) < 1000  # it stopped early, not after draining


class TestHostResidentSpeech:
    def test_host_gather_bitexact_vs_device(self, tmp_path):
        """to_host + gather_speech_batch must produce bit-identical batches
        to the device path: same jax.random session draw, numpy slices."""
        from tests.fixtures import make_gwilliams_cache
        from meg_decoding_tpu.data.gwilliams import (
            build_gwilliams_dataset,
            gather_speech_batch,
            load_gwilliams_cache,
            to_host,
        )

        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        train, _ = build_gwilliams_dataset(
            cfg, *load_gwilliams_cache(cache), split_mode="sentence")
        host = to_host(train)
        assert host.host_resident and not train.host_resident
        key = jax.random.PRNGKey(3)
        idx = np.arange(12)
        Xd, Yd, sd, _ = gather_speech_batch(train, idx, key)
        Xh, Yh, sh, _ = gather_speech_batch(host, idx, key)
        assert isinstance(Xh, np.ndarray)
        np.testing.assert_array_equal(np.asarray(Xd), Xh)
        np.testing.assert_array_equal(np.asarray(Yd), Yh)
        np.testing.assert_array_equal(np.asarray(sd), sh)

    def test_spill_dedupes_aliased_split_buffers(self, tmp_path):
        """Sentence/deep splits alias ONE recordings/y_stream device buffer
        across two packed objects (build_gwilliams_dataset); spilling both
        through a shared buffer_cache must pull each device buffer
        host-side ONCE and keep the host copies shared — otherwise
        host_resident doubles its host RAM (and device→host traffic) in
        exactly the full-scale configuration it exists for."""
        from tests.fixtures import make_gwilliams_cache
        from meg_decoding_tpu.data.gwilliams import (
            build_gwilliams_dataset,
            load_gwilliams_cache,
            to_host,
        )

        cache = str(tmp_path / "cache")
        cfg = make_gwilliams_cache(cache)
        train, test = build_gwilliams_dataset(
            cfg, *load_gwilliams_cache(cache), split_mode="sentence")
        assert train.recordings is test.recordings  # the aliasing contract
        buf_cache = {}
        train_h = to_host(train, buf_cache)
        test_h = to_host(test, buf_cache)
        assert train_h.recordings is test_h.recordings
        assert train_h.y_stream is test_h.y_stream
        assert train_h.session_subject is test_h.session_subject
        # per-split onset tables stay distinct
        assert train_h.meg_onsets is not test_h.meg_onsets
        np.testing.assert_array_equal(train_h.recordings,
                                      np.asarray(train.recordings))

    def test_speech_trainer_spill_matches_device_run(self, tmp_path):
        """Gwilliams trainer with host_resident: true streams numpy windows
        through the prefetch pipeline and logs the same metrics as the
        device-resident per-step run (same batches, same math)."""
        import json
        import os

        from tests.fixtures import make_gwilliams_cache
        from meg_decoding_tpu.cli.train_speech import run

        def _cfg(save_root, host):
            cfg = make_gwilliams_cache(str(tmp_path / "cache"))
            cfg.save_root = save_root
            cfg.model = "brain_encoder"
            cfg.D1 = 8
            cfg.D2 = 12
            cfg.F = 16
            cfg.K = 4
            cfg.d_drop = 0.1
            cfg.seq2seq = True
            cfg.batch_size = 8
            cfg.updates = 3
            cfg.epochs = 2
            cfg.use_sampler = True
            cfg.test_size = 8
            cfg.lr = 1e-3
            cfg.lr_scheduler = "none"
            cfg.init_temperature = 5.1
            cfg.seed = 0
            cfg.split_mode = "sentence"
            cfg.fuse_gather = False  # device run must use the same
            # per-step driver the spill path uses, so rows compare 1:1
            cfg.host_resident = host
            cfg.set_dotted("loss.kind", "clip")
            return cfg

        def _rows(save_root):
            rows = []
            for r in sorted(os.listdir(os.path.join(save_root, "runs"))):
                p = os.path.join(save_root, "runs", r, "metrics.jsonl")
                rows += [json.loads(l) for l in open(p)]
            return rows

        run(_cfg(str(tmp_path / "dev"), host=False))
        run(_cfg(str(tmp_path / "host"), host=True))
        a, b = _rows(str(tmp_path / "dev")), _rows(str(tmp_path / "host"))
        assert len(a) == len(b) == 2
        for ra, rb in zip(a, b):
            for k in ra:
                if k.endswith("_ms"):
                    continue
                assert ra[k] == rb[k], (k, ra[k], rb[k])


class TestHostResidentTraining:
    def test_spill_path_matches_device_resident_run(self, tmp_path):
        """GOD trainer with host_resident: true (epochs in host RAM, batches
        streamed through the prefetch pipeline) must log exactly the same
        metrics as the default device-resident run — same batches, same
        math, only the transfer path differs."""
        import json
        import os

        from tests.fixtures import make_god_fixture
        from meg_decoding_tpu.cli.train_god import run

        def _cfg(save_root, host):
            cfg = make_god_fixture(str(tmp_path / "d"),
                                   subjects=("sbj01", "sbj02"))
            cfg.save_root = save_root
            cfg.training_mode = "split"
            cfg.use_sampler = True
            cfg.batch_size = 16
            cfg.updates = 4
            cfg.epochs = 2
            cfg.test_size = 16
            cfg.lr = 1e-3
            cfg.lr_scheduler = "none"
            cfg.reduction = "mean"
            cfg.init_temperature = 5.1
            cfg.model = "linear"
            cfg.F = 16
            cfg.scp = True
            cfg.num_subjects = 2
            cfg.seed = 0
            cfg.host_resident = host
            return cfg

        def _rows(save_root):
            runs = os.listdir(os.path.join(save_root, "runs"))
            rows = []
            for r in sorted(runs):
                p = os.path.join(save_root, "runs", r, "metrics.jsonl")
                rows += [json.loads(l) for l in open(p)]
            return rows

        run(_cfg(str(tmp_path / "dev"), host=False))
        run(_cfg(str(tmp_path / "host"), host=True))
        a, b = _rows(str(tmp_path / "dev")), _rows(str(tmp_path / "host"))
        assert len(a) == len(b) == 2
        for ra, rb in zip(a, b):
            for k in ra:
                if k.endswith("_ms"):
                    continue
                assert ra[k] == rb[k], (k, ra[k], rb[k])

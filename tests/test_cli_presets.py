"""CLI and preset-zoo tests (packaging surface, SURVEY §2 #26)."""

import numpy as np
import pytest

from speex_resampler_tpu import cli
from speex_resampler_tpu.models import PRESETS, describe, get_preset

from conftest import assert_lsb_close, oracle_process


def test_presets_resolve():
    for name in PRESETS:
        d = describe(name, 44100, 48000)
        assert 0 <= d["quality"] <= 10
        assert d["target_chunk_frames"] > 0
        assert d["ratio"] == "147/160"
    with pytest.raises(KeyError):
        get_preset("nope")


def test_cli_info(capsys):
    assert cli.main(["info", "-i", "24000", "-o", "48000", "-q", "5"]) == 0
    out = capsys.readouterr().out
    assert "1/2" in out and "direct" in out


def test_cli_resample_matches_oracle(oracle, fixture_pcm, tmp_path):
    src = tmp_path / "in.pcm"
    src.write_bytes(fixture_pcm["24000hz_mono_test.pcm"][:200_000])
    dst = tmp_path / "out.pcm"
    rc = cli.main(["resample", "-c", "1", "-i", "24000", "-o", "48000",
                   "-q", "5", "--chunk-frames", "4096", str(src), str(dst)])
    assert rc == 0
    got = np.fromfile(dst, dtype=np.int16)
    golden = oracle_process(oracle, tmp_path, src.read_bytes(), 1, 24000,
                            48000, 5, chunk_frames=4096)
    assert got.shape == golden.shape
    assert_lsb_close(got, golden)

"""TensorBoard event-writer: CRC golden vectors, wire-format round-trip
through tensorboard's own reader, and the tabular-logger integration
(reference tabular_logger.py:19-38,131-153 writes one scalar event per
dump_tabular)."""

import glob
import struct

import pytest

from deep_neuroevolution_tpu.utils import tabular
from deep_neuroevolution_tpu.utils.tb_events import (
    EventsWriter,
    crc32c,
    encode_scalar_event,
    masked_crc32c,
)


class TestCRC32C:
    def test_golden_vectors(self):
        # canonical CRC-32C check values
        assert crc32c(b"") == 0x0
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_mask_formula(self):
        # TFRecord masked crc of an 8-byte little-endian length header —
        # independently recomputed
        data = struct.pack("<Q", 24)
        crc = crc32c(data)
        expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc32c(data) == expect


def _scalar(v):
    """Extract the scalar from a Summary.Value; tensorboard's loader
    migrates legacy simple_value into a rank-0 tensor (data_compat)."""
    if v.HasField("tensor") and v.tensor.float_val:
        return v.tensor.float_val[0]
    return v.simple_value


class TestRoundTrip:
    def test_tensorboard_reads_our_file(self, tmp_path):
        tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

        w = EventsWriter(str(tmp_path))
        w.write_scalars(1, {"EpRewMean": 12.5, "Norm": 3.0}, wall_time=100.0)
        w.write_scalars(2, {"EpRewMean": -4.25}, wall_time=101.0)
        w.close()

        events = list(tb.EventFileLoader(w.path).Load())
        assert events[0].file_version == "brain.Event:2"
        e1, e2 = events[1], events[2]
        assert e1.step == 1 and e1.wall_time == 100.0
        vals = {v.tag: _scalar(v) for v in e1.summary.value}
        assert vals == {"EpRewMean": 12.5, "Norm": 3.0}
        assert e2.step == 2
        assert _scalar(e2.summary.value[0]) == -4.25

    def test_non_numeric_values_skipped(self, tmp_path):
        w = EventsWriter(str(tmp_path))
        w.write_scalars(1, {"name": "frostbite", "x": 1.0})
        w.close()
        payload = encode_scalar_event(1, 0.0, {"x": 1.0})
        assert b"frostbite" not in open(w.path, "rb").read()
        assert b"x" in payload


class TestLoggerIntegration:
    def test_dump_tabular_appends_events(self, tmp_path):
        tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

        tabular.start(str(tmp_path))
        tabular.record_tabular("EpRewMean", 7.0)
        tabular.record_tabular("EpLenMean", 30)
        tabular.dump_tabular()
        tabular.record_tabular("EpRewMean", 9.0)
        tabular.dump_tabular()
        tabular.stop()

        paths = glob.glob(str(tmp_path / "events.out.tfevents.*"))
        assert len(paths) == 1
        events = list(tb.EventFileLoader(paths[0]).Load())
        scalar_events = [e for e in events if e.summary.value]
        assert [e.step for e in scalar_events] == [1, 2]
        assert _scalar(scalar_events[1].summary.value[0]) == 9.0

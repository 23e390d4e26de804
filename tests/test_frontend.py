"""Frontend tests: tev wire protocol (ref headless.rs:234-288 tests),
checkpoint/resume, CLI parsing."""

import struct

import numpy as np

from pathtracer_tpu.frontend.tev import (create_image_packet,
                                         update_image_packets)


def test_create_image_packet_bytes():
    """Byte-level CreateImage decode (mirrors ref headless.rs test)."""
    pkt = create_image_packet(640, 480, "render")
    (length,) = struct.unpack("<i", pkt[:4])
    assert length == len(pkt)
    assert pkt[4] == 4  # CreateImage header
    assert pkt[5] == 1  # grab_focus
    assert pkt[6:13] == b"render\x00"
    w, h, nch = struct.unpack("<iii", pkt[13:25])
    assert (w, h, nch) == (640, 480, 3)
    assert pkt[25:] == b"r\x00g\x00b\x00"


def test_update_packets_cover_image():
    rgb = np.arange(120 * 130 * 3, dtype=np.float32).reshape(130, 120, 3)
    pkts = update_image_packets(rgb, "render")
    # 3 channels x 2x2 chunks of 100px
    assert len(pkts) == 3 * 2 * 2
    total_texels = 0
    for p in pkts:
        (length,) = struct.unpack("<i", p[:4])
        assert length == len(p)
        assert p[4] == 3  # UpdateImage header
        body = p[5:]
        assert body[0] == 1  # grab focus
        # name, channel are null-terminated strings
        name_end = body.index(b"\x00", 1)
        ch_end = body.index(b"\x00", name_end + 1)
        x, y, w, h = struct.unpack("<iiii", body[ch_end + 1:ch_end + 17])
        data = body[ch_end + 17:]
        assert len(data) == 4 * w * h
        total_texels += w * h
    assert total_texels == 3 * 120 * 130


def test_update_packet_chunk_content():
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[..., 0] = 7.0
    pkts = update_image_packets(rgb)
    body = pkts[0][5:]
    name_end = body.index(b"\x00", 1)
    ch_end = body.index(b"\x00", name_end + 1)
    assert body[name_end + 1:ch_end] == b"r"
    vals = np.frombuffer(body[ch_end + 17:], "<f4")
    np.testing.assert_allclose(vals, 7.0)


def test_checkpoint_resume(tmp_path):
    from pathtracer_tpu.integrator import PathConfig, PathIntegrator
    from pathtracer_tpu.scene.mitsuba import load_mitsuba
    cam, sd, _ = load_mitsuba("data/cornell-box.xml", resolution=(16, 16))
    ck = str(tmp_path / "ck.npz")
    cfg = PathConfig(max_depth=2)
    f_direct = PathIntegrator(cfg, spp=4).render(cam, sd)
    # chunked with checkpoint
    integ = PathIntegrator(cfg, spp=4)
    f_chunk = integ.render_progressive(cam, sd, chunk_spp=2, checkpoint=ck)
    np.testing.assert_allclose(np.asarray(f_direct), np.asarray(f_chunk),
                               atol=2e-5)
    # resume from a completed checkpoint: no work, same result
    integ2 = PathIntegrator(cfg, spp=4)
    f_resume = integ2.render_progressive(cam, sd, chunk_spp=2, checkpoint=ck)
    np.testing.assert_array_equal(np.asarray(f_chunk), np.asarray(f_resume))
    assert integ2.last_ray_count == 0.0


def test_cli_parser_flags():
    from pathtracer_tpu.frontend.cli import build_parser, parse_resolution
    p = build_parser()
    args = p.parse_args(["scene.xml", "-o", "out", "-s", "16",
                         "-r", "640x480", "-d", "7", "--headless",
                         "--mesh", "4"])
    assert args.samples == 16 and args.max_depth == 7
    assert parse_resolution(args.resolution) == (640, 480)
    assert args.mesh == 4 and args.headless
    assert args.server == "127.0.0.1:14158"  # reference default

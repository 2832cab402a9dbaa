"""S2 seed import, S6 export, multimodal stages, property tests."""

import pyarrow as pa
import pytest

from freshonions_torscraper_ray.functions.regexes import canonicalize_url
from freshonions_torscraper_ray.sources.seeds import parse_onion_lines
from freshonions_torscraper_ray.stages.multimodal import (
    ImageDecoder,
    ImageResizer,
    media_rows_from_spans,
)

DOM = "a" * 16 + ".onion"
DOM3 = "b" * 56 + ".onion"


def test_parse_onion_lines_tolerant():
    t = pa.Table.from_arrays(
        [
            pa.array(
                [
                    f"visit http://{DOM}/page now",
                    "no onions here",
                    f"bare {DOM3} mention",
                    f"TWO: {DOM} and {DOM}",
                ]
            )
        ],
        names=["text"],
    )
    urls = parse_onion_lines(t).to_pydict()["url"]
    assert urls == [f"http://{DOM}/", f"http://{DOM3}/", f"http://{DOM}/", f"http://{DOM}/"]


def test_canonicalize_idempotent():
    # property: canonicalize ∘ canonicalize == canonicalize
    cases = [f"HTTP://{DOM.upper()}/A#x", f"https://{DOM}:443/p", f"http://{DOM3}:8080/q"]
    for c in cases:
        once = canonicalize_url(c)
        assert once is not None and canonicalize_url(once) == once


def _media_fixture():
    spans = [
        [
            {"kind": "text", "text": "hi", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": f"http://{DOM}/img/1.png", "offset": 2},
            {"kind": "image", "text": "", "media_ref": f"http://{DOM}/img/2.png", "offset": 3},
        ]
    ]
    from freshonions_torscraper_ray.schemas import DOCUMENTS

    return pa.Table.from_arrays(
        [pa.array([f"http://{DOM}/"], pa.string()), pa.array(spans, DOCUMENTS.field("spans").type)],
        names=["doc_id", "spans"],
    )


def test_media_explode_and_decode_deterministic():
    media = media_rows_from_spans(_media_fixture())
    assert media.num_rows == 2
    assert media["media_type"].to_pylist() == ["image", "image"]
    payloads1 = media["payload"].to_pylist()
    payloads2 = media_rows_from_spans(_media_fixture())["payload"].to_pylist()
    assert payloads1 == payloads2  # deterministic fake payloads

    dec = ImageDecoder(feature_dim=4)
    out1 = dec(media)
    out2 = ImageDecoder(feature_dim=4)(media)
    assert out1["height"].to_pylist() == out2["height"].to_pylist()
    assert "payload" not in out1.column_names  # raw bytes dropped post-decode
    assert len(out1["features"][0].as_py()) == 4

    resized = ImageResizer(max_side=64)(out1)
    assert max(resized["height"].to_pylist() + resized["width"].to_pylist()) <= 64


def test_decoder_strict_mode_raises_without_codec():
    dec = ImageDecoder(strict=True)
    if not dec._pil:
        with pytest.raises(NotImplementedError):
            dec(media_rows_from_spans(_media_fixture()))


def test_frame_sampler_stride_and_determinism():
    from freshonions_torscraper_ray.stages.multimodal import FrameSampler

    media = media_rows_from_spans(_media_fixture())
    fs = FrameSampler(stride=10, max_frames=3)
    out1 = fs(media)
    out2 = FrameSampler(stride=10, max_frames=3)(media)
    assert out1.to_pylist() == out2.to_pylist()  # deterministic
    assert out1.num_rows >= media.num_rows  # ≥1 frame per payload
    by_ref: dict = {}
    for r in out1.to_pylist():
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    for idxs in by_ref.values():
        assert len(idxs) <= 3
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)  # stride sampling
    strict = FrameSampler(strict=True)
    if not strict._av:
        with pytest.raises(NotImplementedError):
            strict(media)


@pytest.mark.usefixtures("ray_session")
def test_export_onion_list(tmp_path):
    import ray.data as rd

    from freshonions_torscraper_ray.sources.seeds import export_onion_list

    ds = rd.from_arrow(pa.Table.from_arrays([pa.array([DOM, DOM3])], names=["domain"]))
    out = tmp_path / "onions"
    export_onion_list(ds, str(out))
    import glob

    content = "".join(open(f).read() for f in glob.glob(str(out / "*")))
    assert DOM in content and DOM3 in content

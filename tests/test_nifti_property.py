"""Property-based NIfTI codec tests (hypothesis): arbitrary shapes/values round-trip
through the writer and both decoders; the native and python paths always agree."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from vaegan_tpu.data import nifti


@st.composite
def images(draw):
    h = draw(st.integers(min_value=2, max_value=48))
    w = draw(st.integers(min_value=2, max_value=48))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    scale = draw(st.floats(min_value=1e-3, max_value=1e4, allow_nan=False))
    rng = np.random.default_rng(seed)
    img = (rng.normal(size=(h, w)) * scale).astype(np.float32)
    return img


class TestCodecProperties:
    @settings(max_examples=25, deadline=None)
    @given(images(), st.booleans())
    def test_write_read_roundtrip(self, tmp_path_factory, img, gz):
        d = tmp_path_factory.mktemp("prop")
        path = d / ("x.nii.gz" if gz else "x.nii")
        nifti.write_nifti(path, img)
        back = nifti.read_nifti(path)
        np.testing.assert_array_equal(back, img)

    @settings(max_examples=25, deadline=None)
    @given(images(), st.integers(min_value=4, max_value=64))
    def test_native_python_agree(self, tmp_path_factory, img, out_size):
        if not nifti.have_native():
            pytest.skip("C++ decoder not built")
        d = tmp_path_factory.mktemp("prop2")
        path = d / "x.nii"
        nifti.write_nifti(path, img)
        py = nifti.load_image(path, out_size, use_native=False)
        cc = nifti.load_image(path, out_size, use_native=True)
        np.testing.assert_allclose(cc, py, rtol=1e-5, atol=1e-6)
        assert cc.shape == (out_size, out_size, 1)
        assert np.all(cc >= -1e-6) and np.all(cc <= 1 + 1e-6)

    @settings(max_examples=15, deadline=None)
    @given(st.binary(min_size=0, max_size=400))
    def test_garbage_never_crashes_only_raises(self, tmp_path_factory, blob):
        """Arbitrary bytes must produce a clean ValueError from both decoders,
        never a segfault or silent garbage image."""
        d = tmp_path_factory.mktemp("prop3")
        path = d / "g.nii"
        path.write_bytes(blob)
        with pytest.raises((ValueError, EOFError, OSError)):
            nifti.read_nifti(path)
        if nifti.have_native():
            with pytest.raises(ValueError):
                nifti.load_image(path, 16, use_native=True)


class TestHeaderMutationFuzz:
    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1),
           st.lists(st.tuples(st.integers(0, 400), st.integers(0, 255)),
                    min_size=1, max_size=8))
    def test_mutated_headers_never_crash(self, tmp_path_factory, seed, mutations):
        """Flip bytes in a VALID file's header region: both decoders must either
        decode something finite-shaped or raise ValueError — never crash/UB."""
        d = tmp_path_factory.mktemp("fuzz")
        rng = np.random.default_rng(seed)
        img = rng.normal(size=(12, 10)).astype(np.float32)
        path = d / "m.nii"
        nifti.write_nifti(path, img)
        raw = bytearray(path.read_bytes())
        for pos, val in mutations:
            raw[min(pos, len(raw) - 1)] = val
        path.write_bytes(bytes(raw))
        for use_native in ([False, True] if nifti.have_native() else [False]):
            try:
                out = nifti.load_image(path, 8, use_native=use_native)
                assert out.shape == (8, 8, 1)
            except (ValueError, EOFError, OSError):
                pass  # clean rejection is fine

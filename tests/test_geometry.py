"""Geometry unit tests + behavioural parity vs the reference implementation."""

import numpy as np
import pytest

from surfh_tpu.instrument import geometry as geo
from surfh_tpu.instrument.ifu import IFU
from surfh_tpu.instrument.spectral import SpectralBlur

from reference_harness import load_reference_instru, reference_available


class TestCoord:
    def test_add_sub_rotate(self):
        c = geo.Coord(1.0, 2.0) + geo.Coord(0.5, -1.0)
        assert (c.alpha, c.beta) == (1.5, 1.0)
        r = geo.Coord(1.0, 0.0).rotate(90)
        np.testing.assert_allclose([r.alpha, r.beta], [0.0, -1.0], atol=1e-12)

    def test_pix_rounding(self):
        c = geo.Coord(0.126, -0.0749).pix(0.05)
        np.testing.assert_allclose([c.alpha, c.beta], [0.15, -0.05], atol=1e-12)


class TestStepSrf:
    def test_get_step_divides_all(self):
        step = geo.get_step([0.196, 0.196, 0.245, 0.273], 3)
        sizes = np.array([0.196, 0.245, 0.273])
        assert np.all(sizes % step <= sizes.min() / 3 + 1e-12)

    def test_get_srf(self):
        # floor-division semantics (float): 0.245/0.049 = 4.999… → 4
        assert geo.get_srf([0.196, 0.245], 0.049) == [
            int(0.196 // 0.049),
            int(0.245 // 0.049),
        ]
        assert geo.get_srf([0.2, 0.3], 0.1) == [2, 2]


class TestFOV:
    def test_local_global_roundtrip(self):
        fov = geo.FOV(2.0, 3.0, geo.Coord(0.3, -0.2), angle=37.0)
        a, b = fov.local_coords(0.1)
        ga, gb = fov.local2global(a, b)
        # global2local of the global *axes* is not the inverse mapping (it
        # builds an outer product), so check the bbox containment instead.
        bbox = fov.bbox
        assert bbox[0].alpha <= ga.min() and ga.max() <= bbox[1].alpha + 1e-9
        assert bbox[0].beta <= gb.min() and gb.max() <= bbox[1].beta + 1e-9

    def test_vertices_ccw(self):
        fov = geo.FOV(2.0, 1.0, geo.Coord(0, 0), angle=0.0)
        v = fov.vertices
        np.testing.assert_allclose([v[0].alpha, v[0].beta], [-1.0, -0.5])
        np.testing.assert_allclose([v[2].alpha, v[2].beta], [1.0, 0.5])


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
class TestParityWithReference:
    @classmethod
    def setup_class(cls):
        cls.ref = load_reference_instru()

    def test_rotmatrix(self):
        for ang in [0.0, 8.4, 45.0, -120.0]:
            np.testing.assert_allclose(geo.rotmatrix(ang), self.ref.rotmatrix(ang))

    def test_get_step_and_srf(self):
        sizes = [0.196, 0.196, 0.245, 0.273]
        assert geo.get_step(sizes) == self.ref.get_step(sizes)
        step = geo.get_step(sizes)
        assert geo.get_srf(sizes, step) == self.ref.get_srf(sizes, step)

    def test_coord_ops(self):
        mine = geo.Coord(1.2, -3.4).rotate(37.0)
        ref = self.ref.Coord(1.2, -3.4).rotate(37.0)
        np.testing.assert_allclose([mine.alpha, mine.beta], [ref.alpha, ref.beta])
        mine = geo.Coord(0.126, -0.0749).pix(0.05)
        ref = self.ref.Coord(0.126, -0.0749).pix(0.05)
        assert (mine.alpha, mine.beta) == (ref.alpha, ref.beta)

    def test_fov_local_coords_and_transforms(self):
        for angle in [0.0, 8.1, 45.0]:
            mine = geo.FOV(2.0 / 3600, 2.8 / 3600, geo.Coord(0.001, -0.002), angle)
            ref = self.ref.FOV(2.0 / 3600, 2.8 / 3600, self.ref.Coord(0.001, -0.002), angle)
            step = 0.025 / 3600
            ma, mb = mine.local_coords(step, 5 * step, 5 * step)
            ra, rb = ref.local_coords(step, 5 * step, 5 * step)
            np.testing.assert_allclose(ma, ra)
            np.testing.assert_allclose(mb, rb)
            mga, mgb = mine.local2global(ma, mb)
            rga, rgb = ref.local2global(ra, rb)
            np.testing.assert_allclose(mga, rga)
            np.testing.assert_allclose(mgb, rgb)
            ax = np.linspace(-0.001, 0.001, 51)
            bx = np.linspace(-0.001, 0.001, 49)
            mla, mlb = mine.global2local(ax, bx)
            rla, rlb = ref.global2local(ax, bx)
            np.testing.assert_allclose(mla, rla)
            np.testing.assert_allclose(mlb, rlb)

    def test_fov_vertices_bbox(self):
        mine = geo.FOV(3.2, 3.7, geo.Coord(-503.654, -318.742), 8.4)
        ref = self.ref.FOV(3.2, 3.7, self.ref.Coord(-503.654, -318.742), 8.4)
        for mv, rv in zip(mine.vertices, ref.vertices):
            np.testing.assert_allclose([mv.alpha, mv.beta], [rv.alpha, rv.beta])
        np.testing.assert_allclose(
            [mine.bbox[0].alpha, mine.bbox[1].beta], [ref.bbox[0].alpha, ref.bbox[1].beta]
        )

    def test_local_fov_to_slices(self):
        step = 0.025 / 3600
        mine_fov = geo.FOV(2.0 / 3600, 2.8 / 3600, geo.Coord(0, 0), 45.0)
        ref_fov = self.ref.FOV(2.0 / 3600, 2.8 / 3600, self.ref.Coord(0, 0), 45.0)
        ax = np.arange(-100, 101) * step
        bx = np.arange(-90, 91) * step
        shift = geo.Coord(0, 3 * step)
        m = (mine_fov.local + shift).to_slices(ax, bx)
        r = (ref_fov.local + self.ref.Coord(0, 3 * step)).to_slices(ax, bx)
        assert m == r

    def test_spectral_blur_psf(self):
        wavel_axis = np.linspace(7.51, 8.77, 200)
        out_axis = np.linspace(7.5, 8.8, 120)
        beta = np.linspace(-0.1, 0.1, 5)
        mine = SpectralBlur(3050.0).psfs(out_axis, beta, wavel_axis, scale=0.5)
        ref = self.ref.SpectralBlur(3050.0).psfs(out_axis, beta, wavel_axis, scale=0.5)
        np.testing.assert_allclose(mine, ref, rtol=1e-12)

    def test_spectral_blur_dirac(self):
        wavel_axis = np.linspace(7.51, 8.77, 150)
        out_axis = np.linspace(7.5, 8.8, 80)
        beta = np.linspace(-0.05, 0.05, 3)
        mine = SpectralBlur(3050.0).psfs(out_axis, beta, wavel_axis, 0.5, type="dirac")
        ref = self.ref.SpectralBlur(3050.0).psfs(out_axis, beta, wavel_axis, 0.5, type="dirac")
        np.testing.assert_allclose(mine, ref)

    def test_ifu_slits_wslice(self):
        wavel = np.linspace(7.5, 8.9, 970)
        mine = IFU(
            geo.FOV(4.0 / 3600, 4.8 / 3600, geo.Coord(0.001, 0.002), 8.1),
            0.196,
            17,
            SpectralBlur(3050.0),
            None,
            wavel,
            "2A",
        )
        ref = self.ref.IFU(
            self.ref.FOV(4.0 / 3600, 4.8 / 3600, self.ref.Coord(0.001, 0.002), 8.1),
            0.196,
            17,
            self.ref.SpectralBlur(3050.0),
            None,
            wavel,
            "2A",
        )
        for ms, rs in zip(mine.slit_shift, ref.slit_shift):
            np.testing.assert_allclose([ms.alpha, ms.beta], [rs.alpha, rs.beta])
        for mf, rf in zip(mine.slit_fov, ref.slit_fov):
            np.testing.assert_allclose(
                [mf.origin.alpha, mf.origin.beta, mf.beta_width],
                [rf.origin.alpha, rf.origin.beta, rf.beta_width],
            )
        big_axis = np.linspace(7.0, 9.5, 3000)
        assert mine.wslice(big_axis, 0.1) == ref.wslice(big_axis, 0.1)
        step = 0.025 / 3600
        mp, rp = mine.pix(step), ref.pix(step)
        np.testing.assert_allclose(
            [mp.fov.origin.alpha, mp.fov.origin.beta],
            [rp.fov.origin.alpha, rp.fov.origin.beta],
        )

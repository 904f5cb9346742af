"""Flagship model utilities: masks, flux normalization, re-projections."""

import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.simulation.synthetic import make_model


@pytest.fixture(scope="module")
def model_setup():
    return make_model(
        im_size=41, n_lambda=30, n_tpl=3, n_channels=3, n_pointings=2, n_slit=3
    )


def test_real_data_jansky_scaling(model_setup):
    model, setup = model_setup
    y = np.asarray(model.forward(setup["maps"]))
    scaled = model.real_data_janskySR_to_jansky(y.copy())
    assert scaled.shape == y.shape
    # scaling is per-slit multiplicative and positive
    ratio = scaled[np.abs(y) > 1e-6] / y[np.abs(y) > 1e-6]
    assert np.all(ratio > 0)


def test_make_mask(model_setup):
    model, setup = model_setup
    y = np.asarray(model.forward(setup["maps"]))
    masks = model.make_mask(y, threshold=0.0, nslice=5)
    assert len(masks) == max(1, len(model.channels) // 3)
    for m in masks:
        assert m.shape == model.imshape and m.dtype == bool


def test_plot_slice(model_setup):
    model, setup = model_setup
    y = np.asarray(model.forward(setup["maps"]))
    mean_img, global_img = model.plot_slice(y, n_chan=0, nslice=5)
    assert mean_img.shape == model.imshape
    assert global_img.shape == model.imshape
    assert np.isfinite(global_img).all()


def test_slice_to_cube_roundtrip(model_setup):
    model, setup = model_setup
    chan = model.channels[0]
    y = np.asarray(model.forward(setup["maps"]))
    block = model.split(y)[0]
    cube = chan.sliceToCube(block)
    assert cube.shape == model.cube_shape
    # re-projection puts energy only inside the channel's λ window
    outside = np.delete(np.arange(model.cube_shape[0]), np.arange(chan.wslice.start, chan.wslice.stop))
    assert np.abs(cube[outside]).max() == 0
    assert np.abs(cube[chan.wslice]).max() > 0


def test_realdata_cube_slice_roundtrip(model_setup):
    model, setup = model_setup
    chan = model.channels[0]
    # the dirac re-projection works on a cube sampled at *detector* λ
    n_det = len(chan.instr.wavel_axis)
    cube_w = np.random.default_rng(0).random((n_det,) + model.imshape)
    slices = chan.realData_cubeToSlice(cube_w)
    assert slices.shape == chan.oshape[1:]
    back = chan.realData_sliceToCube(slices, (n_det,) + model.imshape)
    assert back.shape == (n_det,) + model.imshape


def test_make_mask_groups_real_band_names():
    """Non-multiple-of-3 MIRI band lists group by channel digit (reference
    assumes fixed A/B/C triples, spectroModel.py:296-297; ours generalizes):
    ['1a','1b','2a'] → one mask per channel 1 and channel 2."""
    from surfh_tpu.models.spectro import SpectroSigRLSCT
    from surfh_tpu.simulation.flagship import make_allband_setup

    setup = make_allband_setup(
        npix=31, bands=["1a", "1b", "2a"], n_pointings=1, n_tpl=2,
        lambda_subsample=6,
    )
    model = SpectroSigRLSCT(
        setup["sotf"], setup["templates"], setup["alpha_axis"],
        setup["beta_axis"], setup["wavelength_axis"], setup["instrs"],
        setup["step_degree"], setup["pointings"],
    )
    assert model._mask_group_leads() == [0, 2]
    y = np.asarray(model.forward(setup["maps"]))
    masks = model.make_mask(y, threshold=0.0, nslice=5)
    assert len(masks) == 2
    for m in masks:
        assert m.shape == model.imshape and m.dtype == bool

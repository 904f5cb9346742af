"""Visualization smoke tests (headless matplotlib)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from surfh_tpu.viz import (
    plot_concatenated_cubes,
    plot_cube,
    plot_maps,
    plot_two_cubes,
    visualize_corrected_slices,
)


def test_plot_cube_and_slider():
    cube = np.random.rand(5, 8, 8)
    fig, slider = plot_cube(cube, np.linspace(5, 6, 5), show=False)
    slider.set_val(3)
    assert fig is not None


def test_plot_two_cubes():
    fig, slider = plot_two_cubes(
        np.random.rand(4, 8, 8), np.linspace(5, 6, 4),
        np.random.rand(6, 8, 8), np.linspace(5, 6, 6), show=False,
    )
    slider.set_val(2)


def test_plot_concatenated():
    fig, _ = plot_concatenated_cubes(
        [np.random.rand(3, 8, 8), np.random.rand(4, 8, 8)],
        [np.linspace(6, 7, 3), np.linspace(5, 6, 4)],
        show=False,
    )
    assert fig is not None


def test_plot_maps_and_slices():
    assert plot_maps(np.random.rand(4, 8, 8), show=False) is not None
    assert (
        visualize_corrected_slices((3, 6, 4), np.random.rand(3, 6, 4), show=False)
        is not None
    )

"""float16 display readback of the browse planes (round-4 VERDICT items 1-2).

The browse planes exist to be pcolormesh'd; shipping them as sqrt-domain
float16 + one float32 scale halves the dominant d2h bytes.  Quantizing in
the sqrt domain bounds the PER-PIXEL RELATIVE error (≤ ~2⁻¹⁰ for pixels
≥ 4e-9 of the plane max — nine decades), so log/dsqrt display scalings
stay faithful; the earlier linear-domain form carried up to 100% relative
error on dim pixels (round-4 VERDICT item 2).  These tests pin both the
of-max and the relative/log-domain bounds against the exact f32 planes.
"""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.models import make_random_crystal_trajectory

F16_EPS = 2.0 ** -10          # one ulp of slack over the 2^-11 rounding step
REL_EPS = 2.0 ** -9           # sqrt-domain: intensity rel err ~2^-10, 2x slack
REL_FLOOR = 4e-9              # of-max intensity below which abs bound applies


def assert_display_faithful(f16: np.ndarray, exact: np.ndarray):
    """The decompressed plane must match the exact one pixel-by-pixel in
    RELATIVE terms above the f16-normal floor, absolutely below it."""
    floor = REL_FLOOR * exact.max()
    bright = exact >= floor
    rel = np.abs(f16[bright] - exact[bright]) / exact[bright]
    assert rel.max() <= REL_EPS
    if (~bright).any():
        assert np.abs(f16[~bright] - exact[~bright]).max() <= floor


@pytest.fixture(scope='module')
def calc():
    traj = make_random_crystal_trajectory(n_cells_xyz=(3, 3, 2), basis=2,
                                          n_frames=20, dt_ps=0.02, seed=3)
    return SEDCalculator(traj, nx=3, ny=3, nz=2)


@pytest.fixture(scope='module')
def kv():
    return np.outer(np.linspace(0.1, 1.4, 10), [1, 0.3, 0]).astype(np.float32)


def test_intensity_quantization_bounded(calc, kv):
    _, exact, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=4)
    _, f16, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                            readback_dtype='float16')
    assert f16.dtype == np.float32                 # rescaled on host
    assert f16.shape == exact.shape
    assert np.abs(f16 - exact).max() <= F16_EPS * exact.max()
    assert_display_faithful(f16, exact)


def test_log_scaling_fidelity(calc, kv):
    """Under the GUI's log display scaling the compressed plane must track
    the exact one everywhere above the relative floor — the round-4 defect
    was unbounded relative error exactly where log scaling amplifies."""
    from psa_tpu.gui.controller import apply_scale
    _, exact, _ = calc.calculate_kgrid_browse(kv)
    _, f16, _ = calc.calculate_kgrid_browse(kv, readback_dtype='float16')
    floor = REL_FLOOR * exact.max()
    bright = exact >= max(floor, 1e-12)
    log_err = np.abs(apply_scale(f16, 'log') - apply_scale(exact, 'log'))
    # |Δlog10(x)| = rel_err / ln(10) ≤ 2^-9 / 2.30 ≈ 8.5e-4
    assert log_err[bright].max() <= REL_EPS / np.log(10)
    d_err = np.abs(apply_scale(f16, 'dsqrt')[bright]
                   - apply_scale(exact, 'dsqrt')[bright])
    assert (d_err / apply_scale(exact, 'dsqrt')[bright]).max() <= REL_EPS


def test_scan_path_quantization_bounded(calc, kv):
    # k_chunk_size=2 -> multiple chunks -> the lax.map scan path
    _, exact, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=2)
    _, f16, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=2,
                                            readback_dtype='float16')
    assert np.abs(f16 - exact).max() <= F16_EPS * exact.max()


def test_chiral_phase_f16_resolution(calc, kv):
    _, i32, p32 = calc.calculate_kgrid_browse(kv, chiral=True)
    _, i16, p16 = calc.calculate_kgrid_browse(kv, chiral=True,
                                              readback_dtype='float16')
    assert p16 is not None and p16.dtype == np.float32
    # phase spans ±π/2: float16 resolves it to ~5e-4 rad
    assert np.abs(p16 - p32).max() <= 2e-3
    assert np.abs(i16 - i32).max() <= F16_EPS * i32.max()


def test_incoherent_f16_accumulates(calc, kv):
    _, exact, _ = calc.calculate_kgrid_browse(
        kv, basis_atom_types=[1, 2], summation_mode='incoherent')
    _, f16, _ = calc.calculate_kgrid_browse(
        kv, basis_atom_types=[1, 2], summation_mode='incoherent',
        readback_dtype='float16')
    assert np.abs(f16 - exact).max() <= 2 * F16_EPS * exact.max()


def test_welch_f16_compose(calc, kv):
    _, exact, _ = calc.calculate_kgrid_browse(kv, welch_segments=2)
    _, f16, _ = calc.calculate_kgrid_browse(kv, welch_segments=2,
                                            readback_dtype='float16')
    assert np.abs(f16 - exact).max() <= F16_EPS * exact.max()


def test_validation(calc, kv):
    with pytest.raises(ValueError, match="readback_dtype"):
        calc.calculate_kgrid_browse(kv, readback_dtype='bf16')
    with pytest.raises(ValueError, match="direct"):
        calc.calculate_kgrid_browse(kv, readback_dtype='float16',
                                    engine='gridded', k_grid_shape=(5, 2))

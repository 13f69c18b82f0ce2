"""CLI end-to-end: dump file + YAML config -> SED caches + plots + iSED dump."""
import json

import numpy as np
import pytest
import yaml

from psa_tpu.cli import main
from psa_tpu.io.writer import out_to_qdump
from psa_tpu.models import make_chain_trajectory


@pytest.fixture
def workdir(tmp_path):
    """A dump file with velocities + a config, in a temp dir."""
    traj = make_chain_trajectory(n_cells=12, n_frames=48, dt_ps=0.02, a=2.5,
                                 omega_max_thz=6.0)
    dump = tmp_path / "chain.dump"
    with open(dump, "w") as f:
        for t in range(traj.n_frames):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{traj.n_atoms}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write(f"0.0 {traj.box_matrix[d, d]:.6f}\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a_ in range(traj.n_atoms):
                p, v = traj.positions[t, a_], traj.velocities[t, a_]
                f.write(f"{a_ + 1} {traj.types[a_]} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x', [1, 0, 0]], 'n_kpoints': 10,
                            'bz_coverage': 0.5},
        'plotting': {'max_freq_2d': 8.0},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.dump(config))
    return tmp_path, dump, cfg_path


def test_cli_end_to_end(workdir):
    tmp_path, dump, cfg = workdir
    out = tmp_path / "out"
    main(['--trajectory', str(dump), '--config', str(cfg), '--output-dir', str(out)])
    # per-direction intensity plots
    assert (out / "sed_intensity_2D_x.png").exists()
    assert (out / "sed_intensity_2D_1.00_0.00_0.00.png").exists()
    # SED cache files (dotted label must survive)
    assert (out / "sed_data_regular_1.00_0.00_0.00.sed.npy").exists()
    # cache reuse path: second run loads instead of recalculating
    main(['--trajectory', str(dump), '--config', str(cfg), '--output-dir', str(out)])


def test_cli_chiral_mode(workdir):
    tmp_path, dump, cfg = workdir
    out = tmp_path / "out_chiral"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out), '--chiral', '--nk', '8'])
    assert (out / "sed_phase_2D_x.png").exists()
    assert (out / "sed_data_chiral_x.phase.npy").exists()


def test_cli_ised(workdir, tmp_path):
    _, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 8, 'bz_coverage': 0.5},
        'ised': {'apply': True,
                 'k_path': {'direction': 'x', 'characteristic_length': 2.5,
                            'n_points': 12, 'bz_coverage': 0.5},
                 'target_point': {'k_value': 0.6, 'w_value_thz': 4.0},
                 'reconstruction': {'rescaling_factor': 'auto',
                                    'num_animation_timesteps': 6,
                                    'output_dump_filename': 'motion.dump'}},
    }
    cfg = tmp_path / "ised_cfg.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_ised"
    main(['--trajectory', str(dump), '--config', str(cfg), '--output-dir', str(out)])
    assert (out / "motion.dump").exists()
    assert list(out.glob("iSED_*.png"))


def test_cli_missing_trajectory(tmp_path):
    with pytest.raises(SystemExit):
        main(['--trajectory', str(tmp_path / "nope.dump"),
              '--output-dir', str(tmp_path / "o")])


def test_cli_multi_direction_global_scale(workdir):
    """Two directions -> the global-max normalization pass runs and both
    intensity plots share the scale (reference computed it but never used it)."""
    tmp_path, dump, cfg = workdir
    out = tmp_path / "out_multi"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out), '--precision', 'parity'])
    pngs = list(out.glob("sed_intensity_2D_*.png"))
    assert len(pngs) == 2


def test_cli_profile_flag(workdir):
    tmp_path, dump, cfg = workdir
    out = tmp_path / "out_prof"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out), '--nk', '6', '--profile'])
    assert (out / "profile").exists()


def test_cli_dispersion_summary_switch(workdir, tmp_path):
    import yaml as _yaml
    _, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 8, 'bz_coverage': 0.5},
        'plotting': {'max_freq_2d': 8.0, 'enable_3d_dispersion_plot': True},
    }
    cfg = tmp_path / "disp_cfg.yaml"
    cfg.write_text(_yaml.dump(config))
    out = tmp_path / "out_disp"
    main(['--trajectory', str(dump), '--config', str(cfg), '--output-dir', str(out)])
    assert list(out.glob("disp_summary_*.png"))


@pytest.mark.slow
def test_cli_kgrid_and_dos_sections(workdir):
    """The optional kgrid/dos config sections (beyond the reference CLI)
    produce dispersion-surface and DOS artifacts."""
    tmp_path, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 6,
                            'bz_coverage': 0.5},
        'kgrid': {'apply': True, 'plane': 'xy', 'k_range': [-1.0, 1.0],
                  'n_k': 8, 'n_peaks': 2, 'max_freq': 8.0,
                  'width_method': 'lorentzian', 'group_velocity': True,
                  'thermal_conductivity': True},
        'dos': {'apply': True, 'max_freq': 8.0, 'per_type': True},
        'timecorr': {'apply': True, 'observables': ['msd', 'vacf'],
                     'n_lags': 12, 'per_type': True},
        'rdf': {'apply': True, 'n_bins': 30, 'per_type': True},
    }
    cfg = tmp_path / "kgdos.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_kgdos"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    z = np.load(out / "kgrid_peaks_xy.npz")
    assert z['peak_freqs'].shape == (2, 64)
    assert np.all(z['peak_freqs'] <= 8.0 + 1e-6)
    assert (out / "kgrid_peaks_xy.png").exists()
    assert z['group_velocity_x'].shape == (2, 8, 8)
    assert z['band_freqs'].shape == (2, 8, 8)
    assert (out / "kgrid_group_velocity_xy.png").exists()
    kappa = json.loads((out / "kappa_xy.json").read_text())
    assert set(kappa) >= {'kappa_xx_w_per_mk', 'kappa_yy_w_per_mk',
                          'n_modes_used', 'n_modes_total'}
    assert z['lifetimes_ps'].shape == (2, 8, 8)
    dos = np.loadtxt(out / "dos.csv", delimiter=',', skiprows=1)
    assert dos.shape[1] == 2           # freq + one curve (single type)
    assert (out / "dos.png").exists()
    for obs in ('msd', 'vacf'):
        curve = np.loadtxt(out / f"{obs}.csv", delimiter=',', skiprows=1)
        assert curve.shape == (12, 2)  # lag_ps + one curve (single type)
        assert curve[0, 0] == 0.0      # τ axis starts at 0
        assert (out / f"{obs}.png").exists()
    # VACF(0) = <|v|^2> > 0; MSD starts at ~0 and grows
    vacf = np.loadtxt(out / "vacf.csv", delimiter=',', skiprows=1)
    assert vacf[0, 1] > 0 and vacf[0, 1] >= np.abs(vacf[1:, 1]).max() - 1e-6
    msd = np.loadtxt(out / "msd.csv", delimiter=',', skiprows=1)
    assert msd[1:, 1].max() > msd[0, 1]
    rdf = np.loadtxt(out / "rdf.csv", delimiter=',', skiprows=1)
    # single type: total + the 1-1 partial, which must coincide
    assert rdf.shape == (30, 3)
    np.testing.assert_allclose(rdf[:, 1], rdf[:, 2], rtol=1e-6)
    assert (out / "rdf.png").exists()
    # crystal chain: no pairs below the nearest-neighbor distance
    assert rdf[rdf[:, 0] < 2.0, 1].max() == 0.0

    # browse mode + chiral
    config['kgrid'].update({'mode': 'browse', 'chiral': True})
    cfg.write_text(yaml.dump(config))
    out2 = tmp_path / "out_browse"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out2)])
    z2 = np.load(out2 / "kgrid_browse_xy.npz")
    assert z2['intensity'].shape[1] == 64
    assert 'phase' in z2


def test_cli_welch_mode(workdir, tmp_path):
    tmp_path, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 10,
                            'bz_coverage': 0.5, 'welch_segments': 4},
    }
    cfg = tmp_path / "welch_cfg.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_welch"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    assert (out / "sed_intensity_2D_x.png").exists()
    sed = np.load(out / "sed_data_welch4_x.sed.npy")
    assert not np.iscomplexobj(sed)
    assert sed.shape[0] == 48 // 4  # n_freq = n_frames // segments


def test_cli_lt_polarization(workdir, tmp_path):
    tmp_path, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 10,
                            'bz_coverage': 0.5,
                            'polarization': 'longitudinal'},
    }
    cfg = tmp_path / "lt_cfg.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_lt"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    assert (out / "sed_intensity_2D_x.png").exists()
    sed = np.load(out / "sed_data_lt_long_x.sed.npy")
    assert not np.iscomplexobj(sed)
    # ω >= 0 rows only (the L/T reduction filters on device; even-n fftfreq
    # labels the Nyquist row negative, so n/2 rows are kept)
    assert sed.shape == (48 // 2, 10)

    # transverse plane caches under a distinct label
    config['sed_calculation']['polarization'] = 'transverse'
    cfg.write_text(yaml.dump(config))
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    trans = np.load(out / "sed_data_lt_trans_x.sed.npy")
    # chain motion is longitudinal: the transverse plane carries ~nothing
    assert trans.sum() < 1e-5 * sed.sum()

    # chiral + L/T rejected at validation
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out), '--chiral'])


def test_cli_welch_chiral_conflict(workdir, tmp_path):
    tmp_path, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 10,
                            'bz_coverage': 0.5, 'welch_segments': 4},
    }
    cfg = tmp_path / "welch_chiral_cfg.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_conflict"
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out), '--chiral'])


def test_cli_dsf_section(workdir):
    """The optional dsf config section writes instantaneous-phase maps
    (snapped to box-commensurate k) alongside the harmonic SED run."""
    tmp_path, dump, _ = workdir
    config = {
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 8,
                            'bz_coverage': 0.5},
        'dsf': {'apply': True, 'max_freq': 8.0, 'n_lags': 10, 'kww': True,
                'observables': ['total', 'longitudinal', 'self', 'sk',
                                'isf', 'isf_self']},
    }
    cfg = tmp_path / "dsf.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out_dsf"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    z = np.load(out / "dsf_x.npz")
    n_k, n_f = len(z['k_mags']), len(z['freqs'])
    assert n_k >= 2                       # snapped + de-duplicated path
    assert z['s'].shape == z['c_l'].shape == z['s_self'].shape == (n_f, n_k)
    assert np.all(z['freqs'] >= 0) and np.all(z['freqs'] <= 8.0)
    # commensurate: every k component is an integer multiple of 2pi/L
    box_l = 12 * 2.5
    m = z['k_vectors'][:, 0] * box_l / (2 * np.pi)
    np.testing.assert_allclose(m, np.round(m), atol=1e-5)
    for obs in ('total', 'longitudinal', 'self', 'sk', 'isf', 'isf_self'):
        assert (out / f"dsf_{obs}_x.png").exists()
    assert not (out / "dsf_transverse_x.png").exists()
    # static structure factor: one value per k, and Parseval ties it to the
    # full-frequency integral of S(k,ω) (only ω>=0 rows are saved here, so
    # just check shape/positivity at this level; physics pinned in test_dsf)
    assert z['sk'].shape == (n_k,) and np.all(z['sk'] >= 0)
    # ISF: τ axis honors n_lags, zero-lag identities hold
    assert z['lags_ps'].shape == (10,) and z['lags_ps'][0] == 0.0
    assert z['isf'].shape == z['isf_self'].shape == (10, n_k)
    np.testing.assert_allclose(z['isf'][0], z['sk'], rtol=1e-5)
    np.testing.assert_allclose(z['isf_self'][0], 1.0, rtol=1e-5)
    # kww: true adds per-k fit arrays for every isf plane
    for obs in ('isf', 'isf_self'):
        for fld in ('kww_amp', 'kww_tau', 'kww_beta', 'kww_rms',
                    'tau_alpha'):
            assert z[f'{fld}_{obs}'].shape == (n_k,)

    # kww without an isf observable is rejected at config validation
    config['dsf']['observables'] = ['total']
    cfg.write_text(yaml.dump(config))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out)])
    config['dsf']['observables'] = ['total', 'longitudinal', 'self', 'sk',
                                    'isf', 'isf_self']

    # malformed kww_window is rejected at config validation
    config['dsf']['kww_window'] = [2.0, 1.0]
    cfg.write_text(yaml.dump(config))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out)])
    del config['dsf']['kww_window']
    del config['dsf']['kww']

    # invalid observable is rejected at config validation
    config['dsf']['observables'] = ['density']
    cfg.write_text(yaml.dump(config))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out)])

    # non-integer n_lags is rejected at config validation, before any compute
    config['dsf']['observables'] = ['isf']
    config['dsf']['n_lags'] = 'ten'
    cfg.write_text(yaml.dump(config))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(out)])


def test_cli_npt_section(tmp_path):
    """npt section: breathing-box dump -> fractional-anchor SED outputs.

    The loader must fill Trajectory.box_matrices from the varying BOX
    BOUNDS, and the section must write npt_sed.{npz,png} with the mean-cell
    Cartesian k axes."""
    n_at, n_frames, a = 12, 32, 2.5
    L0 = n_at * a
    rng = np.random.default_rng(0)
    lam = 1.0 + 0.01 * np.sin(2 * np.pi * np.arange(n_frames) / n_frames)
    x_frac = (np.arange(n_at) + 0.5) / n_at
    dump = tmp_path / "npt.dump"
    with open(dump, "w") as f:
        for t in range(n_frames):
            L = lam[t] * L0
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_at}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            f.write(f"0.0 {L:.6f}\n0.0 10.0\n0.0 10.0\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for i in range(n_at):
                f.write(f"{i + 1} 1 {L * x_frac[i]:.6f} 1.0 1.0 "
                        f"{rng.normal(0, 0.1):.6f} 0.0 0.0\n")
    config = {
        'md_system': {'dt': 0.02, 'nx': n_at, 'ny': 1, 'nz': 1,
                      'lattice_parameter': a},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4,
                            'bz_coverage': 0.5},
        'npt': {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 6},
    }
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.dump(config))
    out = tmp_path / "out"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    dat = np.load(out / "npt_sed.npz")
    assert dat['intensity'].shape[1] == 6
    assert dat['k_miller'].shape == (6, 3)
    assert dat['k_vectors'].shape == (6, 3)
    assert np.isfinite(dat['intensity']).all()
    # mean-cell Cartesian axis: |k| = 2*pi*m1 / (mean lam * L0)
    expect = 2 * np.pi * dat['k_miller'][:, 0] / (lam.mean() * L0)
    np.testing.assert_allclose(dat['k_mags'], expect, rtol=1e-4)
    assert (out / "npt_sed.png").exists()

    # fixed-cell trajectory: npt section errors cleanly at the CLI boundary
    config_bad = dict(config)
    with open(tmp_path / "fixed.dump", "w") as f:
        for t in range(8):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_at}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            f.write(f"0.0 {L0:.6f}\n0.0 10.0\n0.0 10.0\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for i in range(n_at):
                f.write(f"{i + 1} 1 {L0 * x_frac[i]:.6f} 1.0 1.0 0.1 0.0 0.0\n")
    cfg.write_text(yaml.dump(config_bad))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(tmp_path / "fixed.dump"),
              '--config', str(cfg), '--output-dir', str(tmp_path / "out2")])


def test_cli_npt_config_validation(tmp_path, workdir):
    _, dump, _ = workdir
    bad_cases = [
        {'apply': True, 'direction': [0, 0, 0]},
        {'apply': True, 'direction': [1, 0]},
        {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 0},
        {'apply': True, 'direction': [1, 0, 0], 'max_order': -1},
        {'apply': True, 'k_miller': [[1, 0]]},
        {'apply': True, 'summation_mode': 'chiral'},
    ]
    for npt_cfg in bad_cases:
        cfg = tmp_path / "bad.yaml"
        cfg.write_text(yaml.dump({
            'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
            'sed_calculation': {'directions': ['x'], 'n_kpoints': 4},
            'npt': npt_cfg}))
        with pytest.raises(SystemExit):
            main(['--trajectory', str(dump), '--config', str(cfg),
                  '--output-dir', str(tmp_path / "o")])


def test_cli_phase_mode_validation_and_passthrough(tmp_path, workdir):
    _, dump, _ = workdir
    # invalid engine name fails config validation before any compute
    cfg = tmp_path / "bad_pm.yaml"
    cfg.write_text(yaml.dump({
        'general': {'phase_mode': 'fast'},
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4}}))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(tmp_path / "o")])
    # a valid engine reaches the calculator (NaN k-vectors also rejected
    # by the same validator — ADVICE r4)
    cfg2 = tmp_path / "ok_pm.yaml"
    cfg2.write_text(yaml.dump({
        'general': {'phase_mode': 'factored', 'save_npy_trajectory': False},
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4},
        'dsf': {'apply': True, 'observables': ['total'], 'n_kpoints': 6}}))
    main(['--trajectory', str(dump), '--config', str(cfg2),
          '--output-dir', str(tmp_path / "o2")])
    assert (tmp_path / "o2").exists()


def test_cli_npt_nonfinite_k_rejected(tmp_path, workdir):
    _, dump, _ = workdir
    cfg = tmp_path / "nan.yaml"
    cfg.write_text(yaml.dump({
        'md_system': {'dt': 0.02, 'nx': 12, 'ny': 1, 'nz': 1},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4},
        'npt': {'apply': True, 'k_miller': [[float('nan'), 0, 0]]}}))
    with pytest.raises(SystemExit):
        main(['--trajectory', str(dump), '--config', str(cfg),
              '--output-dir', str(tmp_path / "o")])


def test_cli_npt_sweep_forms(tmp_path):
    """npt.sweep: 'browse' writes device-reduced planes matching the full
    spectrum's ω ≥ 0 rows; 'peaks' writes only the surface triplets."""
    n_at, n_frames, a = 12, 32, 2.5
    L0 = n_at * a
    rng = np.random.default_rng(5)
    lam = 1.0 + 0.01 * np.sin(2 * np.pi * np.arange(n_frames) / n_frames)
    x_frac = (np.arange(n_at) + 0.5) / n_at
    dump = tmp_path / "npt.dump"
    with open(dump, "w") as f:
        for t in range(n_frames):
            L = lam[t] * L0
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_at}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            f.write(f"0.0 {L:.6f}\n0.0 10.0\n0.0 10.0\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for i in range(n_at):
                f.write(f"{i + 1} 1 {L * x_frac[i]:.6f} 1.0 1.0 "
                        f"{rng.normal(0, 0.1):.6f} 0.0 0.0\n")
    base = {
        'md_system': {'dt': 0.02, 'nx': n_at, 'ny': 1, 'nz': 1,
                      'lattice_parameter': a},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4,
                            'bz_coverage': 0.5},
    }
    cfg = tmp_path / "config.yaml"

    # full (reference form) for the contract
    base['npt'] = {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 6}
    cfg.write_text(yaml.dump(base))
    out_full = tmp_path / "out_full"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out_full)])
    full = np.load(out_full / "npt_sed.npz")
    mask = full['freqs'] >= 0

    base['npt'] = {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 6,
                   'sweep': 'browse'}
    cfg.write_text(yaml.dump(base))
    out_b = tmp_path / "out_browse"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out_b)])
    br = np.load(out_b / "npt_sed.npz")
    assert br['freqs'].shape[0] == mask.sum()
    np.testing.assert_allclose(br['intensity'], full['intensity'][mask],
                               rtol=1e-5,
                               atol=1e-8 * full['intensity'].max())
    np.testing.assert_allclose(br['k_mags'], full['k_mags'], rtol=1e-6)
    assert (out_b / "npt_sed.png").exists()

    base['npt'] = {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 6,
                   'sweep': 'peaks', 'n_peaks': 2}
    cfg.write_text(yaml.dump(base))
    out_p = tmp_path / "out_peaks"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out_p)])
    pk = np.load(out_p / "npt_peaks.npz")
    assert pk['peak_freqs'].shape == (2, 6)
    assert pk['peak_widths'].shape == (2, 6)
    # rank-0 peak bins == argmax of the browse plane
    np.testing.assert_allclose(
        pk['peak_freqs'][0], br['freqs'][np.argmax(br['intensity'], axis=0)],
        atol=1e-6)
    assert (out_p / "npt_peaks.png").exists()
    assert not (out_p / "npt_sed.npz").exists()   # peaks-only readback

    # schema: bad sweep / n_peaks rejected at the CLI boundary
    for bad in ({'apply': True, 'sweep': 'surf'},
                {'apply': True, 'n_peaks': 0}):
        base['npt'] = bad
        cfg.write_text(yaml.dump(base))
        with pytest.raises(SystemExit):
            main(['--trajectory', str(dump), '--config', str(cfg),
                  '--output-dir', str(tmp_path / "o")])


def test_cli_npt_peaks_max_freq_caps_search(tmp_path):
    """npt.sweep='peaks' with max_freq must cap the peak SEARCH (like the
    GUI path), not just the plot ylim — a strong out-of-band line must not
    win the ranking."""
    n_at, n_frames, a = 12, 64, 2.5
    L0 = n_at * a
    lam = 1.0 + 0.01 * np.sin(2 * np.pi * np.arange(n_frames) / n_frames)
    x_frac = (np.arange(n_at) + 0.5) / n_at
    tt = np.arange(n_frames) * 0.02
    # weak in-band mode + STRONG out-of-band artifact, both FFT-bin-aligned
    # (64 frames x 0.02 ps -> 0.78125 THz bins) so sinc leakage can't
    # swamp the in-band ranking
    nu_mode, nu_artifact = 3 * 0.78125, 13 * 0.78125     # 2.34, 10.16 THz
    vel = (0.05 * np.cos(2 * np.pi * (3 * x_frac[None, :]
                                      - nu_mode * tt[:, None]))
           + 1.0 * np.cos(2 * np.pi * nu_artifact * tt)[:, None])
    dump = tmp_path / "npt.dump"
    with open(dump, "w") as f:
        for t in range(n_frames):
            L = lam[t] * L0
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_at}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            f.write(f"0.0 {L:.6f}\n0.0 10.0\n0.0 10.0\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for i in range(n_at):
                f.write(f"{i + 1} 1 {L * x_frac[i]:.6f} 1.0 1.0 "
                        f"{vel[t, i]:.6f} 0.0 0.0\n")
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.dump({
        'md_system': {'dt': 0.02, 'nx': n_at, 'ny': 1, 'nz': 1,
                      'lattice_parameter': a},
        'sed_calculation': {'directions': ['x'], 'n_kpoints': 4,
                            'bz_coverage': 0.5},
        'npt': {'apply': True, 'direction': [1, 0, 0], 'n_kpoints': 6,
                'sweep': 'peaks', 'max_freq': 5.0},
    }))
    out = tmp_path / "out"
    main(['--trajectory', str(dump), '--config', str(cfg),
          '--output-dir', str(out)])
    pk = np.load(out / "npt_peaks.npz")
    assert np.all(pk['peak_freqs'] <= 5.0 + 1e-6), pk['peak_freqs']
    # the capped search recovers the in-band mode at m=3
    assert abs(pk['peak_freqs'][0, 2] - 2.34375) < 0.5, pk['peak_freqs']

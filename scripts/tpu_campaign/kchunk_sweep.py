import json, sys, time
import numpy as np, jax
sys.path.insert(0, '/root/repo')
from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays

rng = np.random.default_rng(0)
n_atoms, n_t = 100_000, 2500
a0 = 5.43
side = int(np.ceil((n_atoms / 8) ** (1/3)))
cells = np.stack(np.meshgrid(*[np.arange(side)]*3, indexing='ij'), -1).reshape(-1, 3)
basis = np.array([[0,0,0],[.25,.25,.25],[.5,.5,0],[.75,.75,.25],[.5,0,.5],[.75,.25,.75],[0,.5,.5],[.25,.75,.75]])
sites = ((cells[:,None,:]+basis[None,:,:]).reshape(-1,3)*a0)[:n_atoms]
vel = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
positions = np.broadcast_to(sites.astype(np.float32), (n_t, n_atoms, 3))
box = np.diag([sites.max()+a0]*3).astype(np.float32)
lengths, tilts = make_box_arrays(box)
traj = Trajectory(positions, vel, np.ones(n_atoms, np.int32), np.arange(n_t, dtype=np.float32),
                  box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
calc = SEDCalculator(traj, nx=1, ny=1, nz=1, max_device_bytes=int(13e9))
_, kv, shape = calc.get_k_grid('xy', (-2*np.pi/a0, 2*np.pi/a0), (-2*np.pi/a0, 2*np.pi/a0), 200, 200)
results = {}
for kc in (1280, 2560, 5120, 10240):
    t0 = time.time(); calc.calculate_kgrid_browse(kv, k_chunk_size=kc); first = time.time()-t0
    t0 = time.time(); calc.calculate_kgrid_browse(kv, k_chunk_size=kc); warm = time.time()-t0
    print(f"k_chunk {kc}: warm {warm:.2f}s = {40000/warm:.0f} kps (first {first:.1f}s)", flush=True)
    results[kc] = round(40000/warm, 1)
json.dump(results, open('/root/repo/scripts/tpu_campaign/kchunk_sweep.json', 'w'), indent=1)

import sys, glob, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from ml_conformer_generator_tpu.chem.io import read_mol_file
from ml_conformer_generator_tpu.generator import MLConformerGenerator
from ml_conformer_generator_tpu.parallel.screening import ScreeningDriver

gen = MLConformerGenerator(diffusion_steps=100, node_bucket=1)
driver = ScreeningDriver(gen)
pool = [read_mol_file(f).remove_hs() for f in sorted(glob.glob("/root/reference/assets/demo_files/*.mol"))]
pool = [m for m in pool if gen.min_n_nodes <= m.num_atoms <= gen.max_n_nodes]
refs = [pool[i % len(pool)] for i in range(6)]
t0 = time.time(); driver.screen(pool, n_samples=128, variance=2, score=False)
print("warm done", round(time.time() - t0, 1), flush=True)
for depth in (2, 1):
    rep = driver.screen(refs, n_samples=128, variance=2, score=False, queue_depth=depth)
    print(f"depth={depth}: {rep.n_requested/rep.total_gen_time_s:.1f} raw mol/s", flush=True)

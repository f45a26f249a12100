"""Count trackable corners per rendered frame (VERDICT r4 item 5)."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from limo_tpu.frontend import tracker as trk
from limo_tpu.pipeline.evaluation import make_km_rendered_world
from limo_tpu.pipeline.render import SequenceRenderer

N = 200
world, _ = make_km_rendered_world(1000)
rend = SequenceRenderer(world)
cfg = trk.TrackerConfig(max_features=int(sys.argv[1]) if len(sys.argv) > 1
                        else 512, border=8)
counts = []
for i in (5, 60, 120, 200, 355, 600, 760, 900):
    img, _ = rend.frame(i)
    f = trk.detect(jnp.asarray(img, jnp.float32), cfg)
    counts.append(int(np.asarray(f.valid).sum()))
    print(f"f{i}: {counts[-1]} corners")
print("mean", np.mean(counts))

#!/bin/bash
# Round-2 gallery: converged benchmark-config renders on the TPU.
set -x
cd /root/repo
P="python -m gpupathtracer_tpu.cli"
$P proc:cornell  --spp 256 --width 512 --height 512 \
   --skybox "GENERATE COLOR BLACK" --out gallery/cornell.png
$P proc:bunny    --spp 128 --width 512 --height 512 \
   --out gallery/bunny.png
$P proc:table    --spp 256 --width 640 --height 480 \
   --skybox "GENERATE COLOR BLACK" --out gallery/table.png
$P proc:bathroom --spp 256 --width 640 --height 360 \
   --skybox "GENERATE COLOR BLACK" --microfacet beckmann \
   --out gallery/bathroom.png
$P proc:sponza   --spp 64  --width 1280 --height 720 \
   --skybox "GENERATE COLOR BLACK" --out gallery/sponza.png
# Textured multi-material OBJ town (generated; scene/samplegen.py)
python - <<'EOF'
import math, tempfile
from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.render import Renderer
from gpupathtracer_tpu.scene.samplegen import generate_textured_town
from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
path = generate_textured_town(tempfile.mkdtemp())
cfg = RenderConfig(scene_path=path, skybox="GENERATE COLOR BLACK",
                   width=640, height=360, ray_chunk=1 << 21,
                   cache_enabled=False)
cfg.camera = CameraConfig(position=(0.0, 10.0, -30.0), yaw=math.pi,
                          pitch=-0.25, fov=math.radians(55), aspect=640/360)
r = Renderer(cfg)
for i in range(128):
    r.render_frame(sync=(i % 32 == 31))
print(r.save_screenshot("gallery/town.png"))
EOF

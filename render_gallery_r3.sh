#!/bin/bash
# Round-3 gallery: converged benchmark-config renders on the TPU with the
# round-3 defaults (tsort bounce packets, shadow_sort, unordered occlusion,
# packed shading rows).
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

#!/bin/bash
# Round-5 gallery: converged benchmark-config renders on the TPU with the
# round-5 defaults (regen megakernel on the small scenes — all spp in a
# few dispatches; sponza on the tsort wavefront).
set -x
cd /root/repo
P="python -m gpupathtracer_tpu.cli"
$P proc:cornell  --spp 256 --width 512 --height 512 \
   --skybox "GENERATE COLOR BLACK" --megakernel on --frame-batch 64 \
   --out gallery/cornell.png
$P proc:table    --spp 256 --width 640 --height 480 \
   --skybox "GENERATE COLOR BLACK" --megakernel on --frame-batch 64 \
   --out gallery/table.png
$P proc:bathroom --spp 512 --width 640 --height 360 \
   --skybox "GENERATE COLOR BLACK" --microfacet beckmann \
   --megakernel on --frame-batch 64 --out gallery/bathroom.png
$P proc:bunny    --spp 128 --width 512 --height 512 \
   --out gallery/bunny.png
$P proc:sponza   --spp 64  --width 1280 --height 720 \
   --skybox "GENERATE COLOR BLACK" --out gallery/sponza.png

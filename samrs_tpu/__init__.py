"""samrs-tpu: a TPU-native rebuild of the SAMRS stack in JAX/XLA/Pallas.

Subpackages
-----------
core      config system, mesh/sharding setup, logging/metrics, checkpointing
kernels   Pallas TPU kernels (flash attention, bilinear gather) + pure-JAX oracles
nn        shared neural-net building blocks (LayerNorm2d, MLP, windows, drop-path)
sam       the Segment Anything model family: encoder, prompt encoder, mask decoder,
          predictor, automatic mask generator (reference: Generate Dataset/segment_anything)
geometry  oriented-box <-> polygon transforms (reference: Generate Dataset/utils/transform.py)
data      annotation loaders (DOTA/DIOR/HRSC XML+txt), datasets, label writers, RLE codec
generate  dataset-generation drivers (reference: Generate Dataset/main_sam_*.py)
seg       segmentation backbones + decoders + pretrain/finetune frameworks
train     GSPMD trainers: pretrain / finetune / sliding-window test
tools     statistic / visualize / annotation converters
"""

__version__ = "0.1.0"

# Descriptor ensemble member "v107": SwinV2-Base @ 256, seed variant (reference config_v107.py).
img_width = 256
preprocess = "vit"
model = dict(type="swinv2_base_256")
data = dict(probs=(0.6, 0.4), crop=0.8, mixup=0.1)
seed = 95282

from rs_ov.train.losses import clip_loss, siglip_loss  # noqa: F401
from rs_ov.train.step import make_clip_train_step  # noqa: F401

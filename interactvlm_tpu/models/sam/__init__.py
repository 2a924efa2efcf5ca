from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT  # noqa: F401
from interactvlm_tpu.models.sam.prompt_encoder import PromptEncoder  # noqa: F401
from interactvlm_tpu.models.sam.mask_decoder import MaskDecoder  # noqa: F401
from interactvlm_tpu.models.sam.transformer import TwoWayTransformer  # noqa: F401
from interactvlm_tpu.models.sam.sam import Sam, postprocess_masks  # noqa: F401

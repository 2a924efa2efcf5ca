from interactvlm_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    use_pallas_default,
)

from .attention import attention, attention_pallas, attention_reference  # noqa: F401

from agenda_tpu.data.tokenizer import CLIPTokenizer
from agenda_tpu.data.tokens import compute_token_merge_indices, insert_new_tokens
from agenda_tpu.data.datasets import BaseDataset, TokenDataset, DataLoader

__all__ = [
    "CLIPTokenizer",
    "compute_token_merge_indices",
    "insert_new_tokens",
    "BaseDataset",
    "TokenDataset",
    "DataLoader",
]

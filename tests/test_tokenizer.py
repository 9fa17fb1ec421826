"""Native CLIP BPE tokenizer vs transformers.CLIPTokenizer on the same files,
plus the token merge-index / prompt-rewrite semantics of the reference's
TokenDataset (data_generation/dataset.py:89-97)."""

import numpy as np
import pytest

from agenda_tpu.data.tokenizer import CLIPTokenizer
from agenda_tpu.data.tokens import compute_token_merge_indices, insert_new_tokens
from fixtures import write_tiny_tokenizer

PROMPTS = [
    "an aerial view image with cars in utah",
    "cars",
    "utah utah cars",
    "a photo of CARS, nice!",
    "",
    "word-with-dash and 'quotes'",
]


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tok"))
    write_tiny_tokenizer(d)
    return d


def test_matches_transformers(tok_dir):
    import transformers

    ours = CLIPTokenizer.from_pretrained(tok_dir)
    hf = transformers.CLIPTokenizer.from_pretrained(tok_dir)
    for p in PROMPTS:
        a = ours.encode(p)
        b = hf(p, max_length=77, padding="max_length", truncation=True).input_ids
        assert a == list(b), f"mismatch for {p!r}:\n ours={a[:12]}\n hf  ={b[:12]}"


def test_added_tokens_roundtrip(tok_dir):
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    base = len(ours)
    n = ours.add_tokens(["mytoken_v0", "mytoken_v1"])
    assert n == 2 and len(ours) == base + 2
    ids = ours.convert_tokens_to_ids(["mytoken_v0", "mytoken_v1"])
    assert ids == [base, base + 1]
    enc = ours.encode("mytoken_v0 cars in mytoken_v1 utah")
    assert base in enc and base + 1 in enc
    # added token should be a single id at position 1 (after BOS)
    assert enc[1] == base


def test_merge_indices_single_and_multi(tok_dir):
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    prompt = "an aerial view image with cars in utah"
    idxs, _ = compute_token_merge_indices(ours, prompt, "cars")
    # 'cars</w>' is a single merged token in the fixture vocab
    assert len(idxs) == 1
    toks = ours.tokenize(prompt)
    assert toks[idxs[0] - 1] == "cars</w>"

    idxs_u, _ = compute_token_merge_indices(ours, prompt, "utah")
    assert len(idxs_u) == 1 and idxs_u[0] > idxs[0]

    with pytest.raises(ValueError):
        compute_token_merge_indices(ours, prompt, "zebra")


def test_insert_new_tokens_positions(tok_dir):
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    ours.add_tokens(["fg_v0", "bg_v0"])
    prompt = "an aerial view image with cars in utah"
    new_prompt, starts = insert_new_tokens(ours, prompt, ["cars", "utah"], ["fg_v0", "bg_v0"])
    assert new_prompt == "an aerial view image with fg_v0 cars in bg_v0 utah"
    # After the rewrite, the new token must sit exactly at the recorded start.
    enc = ours.encode(new_prompt)
    fg_id, bg_id = ours.convert_tokens_to_ids(["fg_v0", "bg_v0"])
    assert enc[starts[0]] == fg_id
    assert enc[starts[1]] == bg_id

    # Missing trigger word records -1 (dataset.py:97)
    _, starts2 = insert_new_tokens(ours, "an image of utah", ["cars", "utah"], ["fg_v0", "bg_v0"])
    assert starts2[0] == -1 and starts2[1] > 0


def test_decode_roundtrip(tok_dir):
    ours = CLIPTokenizer.from_pretrained(tok_dir)
    text = "aerial cars utah"
    assert ours.decode(ours.encode(text)) == text

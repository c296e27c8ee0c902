"""Tokenization/masking layer tests (reference semantics:
m2t/data_modules.py:57-143, m2t/conversation_utils.py:36-55)."""

import numpy as np

from llark_tpu.conversation import (
    DEFAULT_CONVERSATION_HEADER,
    concat_audio_token_and_prompt,
    format_conversation,
)
from llark_tpu.special_tokens import (
    DEFAULT_AUDIO_END_TOKEN,
    DEFAULT_AUDIO_PATCH_TOKEN,
    DEFAULT_AUDIO_START_TOKEN,
    IGNORE_INDEX,
)
from llark_tpu.tokenization import (
    TokenizerBundle,
    WordTokenizer,
    expand_audio_placeholder,
    extract_prompt_tokens,
    extract_response_tokens,
    preprocess_conversation,
    prompt_end_token_sequence,
    subsequence_pos,
)


def make_bundle(max_len=512):
    return TokenizerBundle.from_tokenizer(WordTokenizer(max_len))


def test_expand_audio_placeholder():
    out = expand_audio_placeholder("listen: <audio> now", 3)
    assert out == (
        "listen: "
        + DEFAULT_AUDIO_START_TOKEN
        + DEFAULT_AUDIO_PATCH_TOKEN * 3
        + DEFAULT_AUDIO_END_TOKEN
        + " now"
    )
    out2 = expand_audio_placeholder("x <audio>", 2, use_audio_start_end=False)
    assert out2 == "x " + DEFAULT_AUDIO_PATCH_TOKEN * 2


def test_format_conversation_structure():
    turns = [
        {"from": "human", "value": "what genre is this?"},
        {"from": "gpt", "value": "jazz."},
    ]
    conv, rendered = format_conversation(turns)
    assert conv.startswith(DEFAULT_CONVERSATION_HEADER)
    assert "### Human: what genre is this?\n" in conv
    assert "### Assistant: jazz.\n" in conv
    assert conv.endswith("### ")
    assert rendered[0] == "### Human: what genre is this?\n"


def test_concat_audio_token_and_prompt():
    assert concat_audio_token_and_prompt("p", True) == "<audio>\np"
    assert concat_audio_token_and_prompt("p", False) == "p\n<audio>"


def test_preprocess_conversation_masking():
    bundle = make_bundle()
    turns = [
        {"from": "human", "value": "describe the audio"},
        {"from": "gpt", "value": "a piano piece"},
    ]
    out = preprocess_conversation(turns, bundle)
    ids, labels = out["input_ids"], out["labels"]
    assert ids.shape == labels.shape
    assert ids.dtype == np.int32

    # header fully masked
    header_len = bundle.nonpad_len(bundle.encode(DEFAULT_CONVERSATION_HEADER))
    assert (labels[:header_len] == IGNORE_INDEX).all()
    # human turn masked except its first 2 tokens; gpt turn unmasked
    human_len = bundle.nonpad_len(bundle.encode("### Human: describe the audio\n"))
    assert (labels[header_len + 2 : header_len + human_len] == IGNORE_INDEX).all()
    gpt_region = labels[header_len + human_len :]
    assert (gpt_region != IGNORE_INDEX).any()
    # unmasked positions agree with input_ids
    keep = labels != IGNORE_INDEX
    assert (labels[keep] == ids[keep]).all()


def test_audio_patch_tokens_present_after_expansion():
    bundle = make_bundle()
    turns = [
        {"from": "human", "value": expand_audio_placeholder("<audio>\nwhat is this?", 4)},
        {"from": "gpt", "value": "drums"},
    ]
    out = preprocess_conversation(turns, bundle)
    n_patch = int((out["input_ids"] == bundle.audio_patch_id).sum())
    assert n_patch == 4
    starts = int((out["input_ids"] == bundle.audio_start_id).sum())
    ends = int((out["input_ids"] == bundle.audio_end_id).sum())
    assert starts == 1 and ends == 1


def test_subsequence_and_prompt_split():
    assert subsequence_pos([1, 2, 3, 4], [3, 4]) == 2
    assert subsequence_pos([1, 2], [9]) == -1
    ids = [5, 6, 7, 8, 9, 10]
    end = [7, 8]
    assert extract_prompt_tokens(ids, end) == [5, 6, 7, 8]
    assert extract_response_tokens(ids, end) == [9, 10]


def test_prompt_end_token_sequence_found_in_conversation():
    bundle = make_bundle()
    turns = [
        {"from": "human", "value": "hi"},
        {"from": "gpt", "value": "<empty>"},
    ]
    conv, _ = format_conversation(turns)
    ids = bundle.encode(conv)
    end_seq = prompt_end_token_sequence(bundle)
    assert len(end_seq) > 0
    pos = subsequence_pos(ids, end_seq)
    assert pos > 0
    prompt = extract_prompt_tokens(ids, end_seq)
    text = bundle.decode(prompt)
    assert text.rstrip().endswith("Assistant:") or text.rstrip().endswith("Assistant :")


def test_conversation_separator_styles():
    from llark_tpu.conversation import (
        CONVERSATION_TEMPLATES,
        SeparatorStyle,
        conv_mpt,
        conv_vicuna_v1,
        default_conversation,
    )

    msgs = [("Human", "hi"), ("Assistant", None)]
    single = default_conversation.get_prompt(msgs)
    assert single.endswith("Human: hi###Assistant:")

    two = conv_vicuna_v1.get_prompt(
        [("USER", "hi"), ("ASSISTANT", "hello"), ("USER", "more"), ("ASSISTANT", None)]
    )
    assert "USER: hi ASSISTANT: hello</s>" in two
    assert two.endswith("ASSISTANT:")

    mpt = conv_mpt.get_prompt(
        [("<|im_start|>user\n", "hi"), ("<|im_start|>assistant\n", None)]
    )
    assert "<|im_start|>user\nhi<|im_end|>" in mpt
    assert mpt.endswith("<|im_start|>assistant\n")
    assert set(CONVERSATION_TEMPLATES) == {"v1_2", "vicuna_v1", "mpt"}


def test_prompt_text_files_resolve():
    from llark_tpu.dataset_utils import DATASET_INFO
    from llark_tpu.instruct.prompting import resolve_prompt_text

    # the 10 file-backed combos the reference ships
    combos = [("mir", d) for d in ("musicnet", "mtg-jamendo", "magnatagatune", "fma")]
    combos += [("reasoning", d) for d in ("musicnet", "mtg-jamendo", "magnatagatune", "fma")]
    combos += [("captioning", "musicnet"), ("captioning", "fsl10k")]
    for ptype, ds in combos:
        text = resolve_prompt_text(ptype, ds)
        assert "JSON" in text and "dataset" not in text.split()[:5]
    # default prompt always available (missing in the reference release)
    assert "musicologist" in resolve_prompt_text("default", "any")


def test_keys_resolve_from_env(monkeypatch):
    from llark_tpu import keys

    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    monkeypatch.setenv("HF_TOKEN", "hf-test")
    monkeypatch.delenv("HUGGING_FACE_HUB_TOKEN", raising=False)
    assert keys.openai_api_key() == "sk-test"
    assert keys.hugging_face_hub_token() == "hf-test"


def test_adapt_tokenizer_sentinels():
    from llark_tpu.tokenization import WordTokenizer, adapt_tokenizer_for_denoising

    tok = adapt_tokenizer_for_denoising(WordTokenizer(64), num_sentinels=10)
    assert len(tok.sentinel_token_ids) == 10
    assert tok.convert_tokens_to_ids("<extra_id_0>") == tok.sentinel_token_ids[0]
    assert len(set(tok.sentinel_token_ids)) == 10

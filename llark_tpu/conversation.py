"""Conversation templates and `###`-separated chat formatting.

Behavior parity with the reference's default template (reference:
m2t/llava/conversation.py:237-271 `conv_v1_2`, m2t/data_modules.py:92-109
`sentences_to_formatted_conversation`). Only the pieces the training /
inference path actually exercises are implemented; exotic separator styles
from the vendored LLaVA file are out of scope by design.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

BEGIN_SIGNAL = "### "
END_SIGNAL = "\n"

DEFAULT_SYSTEM = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's questions."
)

DEFAULT_ROLES = ("Human", "Assistant")


@dataclasses.dataclass(frozen=True)
class Conversation:
    """A minimal conversation template: system header + role-tagged turns."""

    system: str = DEFAULT_SYSTEM
    roles: Tuple[str, str] = DEFAULT_ROLES
    sep: str = "###"

    @property
    def header(self) -> str:
        """Header prepended to every formatted conversation (system + blank line)."""
        return f"{self.system}\n\n"

    def role_for(self, speaker: str) -> str:
        """Map dataset speaker tags ('human'/'gpt') to display roles."""
        s = speaker.lower()
        if s == "human":
            return self.roles[0]
        if s == "gpt":
            return self.roles[1]
        return "unknown"


default_conversation = Conversation()

# Header constant used by data preprocessing and prompt construction
# (reference: m2t/data_modules.py:46).
DEFAULT_CONVERSATION_HEADER = default_conversation.header

# The token sequence at which generation prompts are cut
# (reference: m2t/tokenizer.py:41-58).
PROMPT_END_TEXT = "\n### Assistant:"


def format_turn(speaker: str, value: str, conv: Conversation = default_conversation) -> str:
    """Render one turn as '### Role: value\\n'."""
    return BEGIN_SIGNAL + conv.role_for(speaker) + ": " + value + END_SIGNAL


def format_conversation(
    turns: Sequence[Dict[str, str]],
    header: str = DEFAULT_CONVERSATION_HEADER,
    conv: Conversation = default_conversation,
) -> Tuple[str, List[str]]:
    """Format a list of `{"from": ..., "value": ...}` turns into one string.

    Returns (full_conversation, per-turn formatted strings). The final
    conversation ends with a dangling '### ' so generation continues from the
    assistant role boundary (reference: m2t/data_modules.py:92-109).
    """
    rendered = [format_turn(t["from"], t["value"], conv) for t in turns]
    conversation = header + "".join(rendered) + BEGIN_SIGNAL
    return conversation, rendered


def concat_audio_token_and_prompt(prompt: str, audio_first: bool) -> str:
    """Place the `<audio>` placeholder before or after the prompt text
    (reference: m2t/data_modules.py:287-292)."""
    from llark_tpu.special_tokens import DEFAULT_AUDIO_TOKEN

    if audio_first:
        return "\n".join((DEFAULT_AUDIO_TOKEN, prompt))
    return "\n".join((prompt, DEFAULT_AUDIO_TOKEN))

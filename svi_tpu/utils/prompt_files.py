"""Prompt-stream file parsing (behavioral ref: test_svi.py:31-60).

The reference exec()s the `prompts = [...]` assignment found in prompt.txt;
we parse the list literal with ast instead (same accepted format, no code
execution)."""

from __future__ import annotations

import ast
import os

DEFAULT_PROMPT = "Default prompt: the subject is moving naturally"


def load_prompts_from_file(prompt_file_path: str) -> list[str]:
    if not os.path.exists(prompt_file_path):
        return [DEFAULT_PROMPT]
    try:
        with open(prompt_file_path, "r", encoding="utf-8") as f:
            content = f.read()
        if "prompts = [" in content:
            start = content.find("prompts = [")
            lit = content[start + len("prompts = ") :]
            # find the matching closing bracket of the list literal
            depth = 0
            for i, ch in enumerate(lit):
                if ch == "[":
                    depth += 1
                elif ch == "]":
                    depth -= 1
                    if depth == 0:
                        lit = lit[: i + 1]
                        break
            prompts = ast.literal_eval(lit)
            if isinstance(prompts, list) and prompts:
                return [str(p) for p in prompts]
        lines = [
            ln.strip()
            for ln in content.split("\n")
            if ln.strip() and not ln.strip().startswith("#")
        ]
        return lines if lines else [DEFAULT_PROMPT]
    except Exception:
        return [DEFAULT_PROMPT]

from .base_prompter import BasePrompter, tokenize_long_prompt
from .omost import OmostPromter
from .prompt_refiners import BeautifulPrompt, QwenPrompt, Translator
from .wan_prompter import WanPrompter

__all__ = ["BasePrompter", "tokenize_long_prompt", "OmostPromter",
           "BeautifulPrompt", "QwenPrompt", "Translator", "WanPrompter"]

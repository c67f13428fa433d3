from .base_prompter import BasePrompter, tokenize_long_prompt
from .cog_prompter import CogPrompter
from .flux_prompter import FluxPrompter
from .hunyuan_dit_prompter import HunyuanDiTPrompter
from .hunyuan_video_prompter import HunyuanVideoPrompter
from .kolors_prompter import KolorsPrompter
from .omnigen_prompter import OmniGenPrompter
from .omost import OmostPromter
from .prompt_refiners import BeautifulPrompt, QwenPrompt, Translator
from .sd3_prompter import SD3Prompter
from .sd_prompter import SDPrompter
from .sdxl_prompter import SDXLPrompter
from .stepvideo_prompter import StepVideoPrompter
from .wan_prompter import WanPrompter

__all__ = [
    "BasePrompter", "tokenize_long_prompt", "CogPrompter", "FluxPrompter",
    "HunyuanDiTPrompter", "HunyuanVideoPrompter", "KolorsPrompter",
    "OmniGenPrompter", "OmostPromter", "BeautifulPrompt", "QwenPrompt",
    "Translator", "SD3Prompter", "SDPrompter", "SDXLPrompter",
    "StepVideoPrompter", "WanPrompter",
]

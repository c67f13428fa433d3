from .wan_prompter import WanPrompter

__all__ = ["WanPrompter"]

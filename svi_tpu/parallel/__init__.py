from .mesh import make_mesh, make_sp_mesh, replicated

__all__ = ["make_mesh", "make_sp_mesh", "replicated"]

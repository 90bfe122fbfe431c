from .registry import TableRegistry, load_table, register_all

__all__ = ["TableRegistry", "load_table", "register_all"]

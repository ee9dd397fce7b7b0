"""CLI engines (SURVEY.md §2 #27-#31).  Invoked via the repo-root wrappers
main_cls.py / main_partseg.py / main_partseg_dist.py / main_semseg.py."""

"""String-keyed component registry.

TPU-native re-expression of the reference's registry pattern
(``sgmse/sgmse/util/registry.py:5-34``): backbones, SDEs, predictors,
correctors, bottlenecks and model families register themselves under a string
name so config files / CLIs can select components by name.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, List, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, managed_thing: str):
        """Create a new registry.

        Args:
            managed_thing: A string describing what is managed by this
                registry, e.g. "Backbone" or "SDE". Used for error messages.
        """
        self.managed_thing = managed_thing
        self._registry: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def inner_wrapper(wrapped_class: T) -> T:
            if name in self._registry:
                raise ValueError(
                    f"{self.managed_thing} with name '{name}' doubly registered"
                )
            self._registry[name] = wrapped_class
            return wrapped_class

        return inner_wrapper

    def get_by_name(self, name: str) -> T:
        """Get a managed class/factory from the registry by name."""
        if name in self._registry:
            return self._registry[name]
        raise ValueError(
            f"{self.managed_thing} with name '{name}' unknown; "
            f"registered: {sorted(self._registry)}"
        )

    def get_all_names(self) -> List[str]:
        """Get the list of things' names registered to this registry."""
        return sorted(self._registry.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._registry
